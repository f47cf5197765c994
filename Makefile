.PHONY: test dist bench validate scaling

test:
	python -m pytest tests/ -x -q

dist:
	mkdir -p dist
	cd . && zip -qr dist/nhao_engine.zip norsk_historisk_avis_ocr_spark \
		-x '*__pycache__*'

bench:
	python bench.py

validate:
	python tools/validate_contract.py

scaling:
	python tools/bench_scaling.py /root/testdata/sf0.1 32
