"""Streaming is intentionally out of scope.

The reference is a batch pipeline with file-granularity resume
(``ocr.py:45-47``); the north rule asks for batch with checkpoint/lineage
semantics, which :mod:`..operators.resume` provides via anti-join +
atomic commits. Event-time/sessionization *logic* that would back an
incremental variant lives as batch window operators in
:mod:`..operators.windows` (sessionize_events) and would transfer directly
to ``applyInPandasWithState`` if a streaming source ever existed.
"""
