"""Byte-contract text stages (clean / reflow / combine / spans / diff).

These re-implement, character-for-character, the *behavior* of the
reference's pure text functions (parity targets, by reference file:line):

- :func:`clean_divider_noise`  ≡ ``engines/tesseract_engine.py:24-65``
- :func:`reflow_text`          ≡ ``engines/tesseract_engine.py:68-88``
- :func:`combine_sections`     ≡ ``engines/tesseract_engine.py:180-183``
- :func:`transcribe_sections`  ≡ ``engines/tesseract_engine.py:186-192``
- :func:`readable_diff`        ≡ ``engines/tesseract_claude_engine.py:15-57``

The reference applies these per OCR section; here they are applied per
extracted layout block inside Arrow-batched pandas UDFs (see
``functions/udfs.py``). Step *order* is load-bearing: near-empty lines are
dropped (not blanked) before blank-run collapsing, so hyphen rejoining in
reflow still sees adjacent lines.
"""

from __future__ import annotations

import re

# Column-divider bleed patterns. The reference's 20px overlap padding makes a
# vertical divider render as a pipe at a line edge, with up to 3 characters of
# the neighboring column bleeding through.
_TRAILING_PIPE = re.compile(r"\s*\|.{0,3}$")
_LEADING_PIPE = re.compile(r"^.{0,3}\|\s*")
_HYPHEN_BREAK = re.compile(r"-\n\s*")
_NEWLINES = re.compile(r"\n+")
_MULTISPACE = re.compile(r"  +")


def clean_divider_noise(text: str) -> str:
    """Strip column-divider pipe artifacts from a raw section text.

    Per line: remove a trailing ``|`` plus up to 3 bleed characters, remove a
    leading run of up to 3 characters ending in ``|``, strip any remaining
    edge pipes, right-strip; then *drop* lines whose stripped length is 1-2
    characters, and finally collapse runs of 2+ blank lines to a single one.
    (Single fused pass — the drop/collapse steps are order-preserving, so
    tracking the blank run while keeping lines is equivalent to the two-loop
    form; byte-equality with the reference is pinned by tests.)
    """
    out = []
    blanks = 0
    for line in text.split("\n"):
        if "|" in line:  # the pipe steps are no-ops otherwise
            line = _TRAILING_PIPE.sub("", line)
            line = _LEADING_PIPE.sub("", line)
            line = line.strip("|")
        line = line.rstrip()
        core = line.lstrip()
        ncore = len(core)
        if ncore == 0:
            # line is blank after rstrip: collapse runs of 2+
            blanks += 1
            if blanks <= 1:
                out.append(line)
            continue
        if ncore <= 2:
            # stray garbage; drop entirely so reflow can rejoin hyphens across
            # what would otherwise become a blank line
            continue
        blanks = 0
        out.append(line)
    return "\n".join(out)


def reflow_text(section_text: str) -> str:
    """Collapse one cleaned section into flowing text.

    Rejoins hyphenated line breaks (``word-\\n  cont`` → ``wordcont``),
    collapses *all* newlines (blank-line paragraph breaks included — they are
    indistinguishable from divider bleed-through) to single spaces, squeezes
    repeated spaces, and strips.
    """
    section_text = section_text.strip()
    if not section_text:
        return ""
    if "\n" not in section_text and "  " not in section_text:
        return section_text  # all three rewrites are no-ops
    section_text = _HYPHEN_BREAK.sub("", section_text)
    section_text = _NEWLINES.sub(" ", section_text)
    section_text = _MULTISPACE.sub(" ", section_text)
    return section_text.strip()


def combine_sections(sections: list[str]) -> str:
    """Join cleaned sections (header first, then columns left→right) with
    blank lines, plus the trailing newline the reference writes to
    ``combined.txt``."""
    return "\n\n".join(sections) + "\n"


def transcribe_sections(sections: list[str]) -> str:
    """Reflow each cleaned section independently, drop empties, join with
    blank lines, plus the trailing newline of ``transcribed.txt``."""
    reflowed = [reflow_text(s) for s in sections]
    return "\n\n".join(s for s in reflowed if s) + "\n"


def section_spans(sections: list[str], labels: list[str]) -> list[dict]:
    """UTF-8 byte offsets ``[start, end)`` of each section inside
    :func:`combine_sections`' output.

    The reference records equivalent geometry in ``detection_info.txt``
    (``engines/_columns.py:383-418``); here the span metadata is first-class
    column data.
    """
    spans = []
    offset = 0
    sep = len("\n\n".encode("utf-8"))
    for i, (label, text) in enumerate(zip(labels, sections)):
        if i > 0:
            offset += sep
        n = len(text.encode("utf-8"))
        spans.append({"section": label, "start": offset, "end": offset + n})
        offset += n
    return spans


def _fast_opcodes(a: list, b: list) -> list:
    """``difflib.SequenceMatcher(None, a, b).get_opcodes()``, faithfully.

    A direct port of CPython's SequenceMatcher for the exact configuration
    this module uses — ``isjunk=None``, ``autojunk=True`` — kept
    semantically identical (same b2j construction, same popular-element
    purge at ``len(b) >= 200``, same tie-breaking scan order in
    ``find_longest_match``, same queue/sort/adjacent-merge in
    ``get_matching_blocks``) but with the per-call overhead removed:
    no instance attribute traffic, no ``Match`` namedtuples, and the
    junk-extension loops dropped outright (``bjunk`` is provably empty
    with ``isjunk=None``, so ``isbjunk`` is constant-False and the two
    junk while-loops can never run). Equality with stdlib difflib is
    pinned by a hypothesis test (``tests/test_textops.py``).
    """
    # __chain_b (isjunk=None branch)
    b2j: dict = {}
    for i, elt in enumerate(b):
        indices = b2j.get(elt)
        if indices is None:
            b2j[elt] = [i]
        else:
            indices.append(i)
    n = len(b)
    if n >= 200:  # autojunk: purge popular elements
        ntest = n // 100 + 1
        popular = [elt for elt, idxs in b2j.items() if len(idxs) > ntest]
        for elt in popular:
            del b2j[elt]

    # get_matching_blocks
    la, lb = len(a), len(b)
    queue = [(0, la, 0, lb)]
    matching_blocks = []
    b2j_get = b2j.get
    nothing: list = []
    while queue:
        alo, ahi, blo, bhi = queue.pop()
        # find_longest_match(alo, ahi, blo, bhi), junk-free case
        besti, bestj, bestsize = alo, blo, 0
        j2len: dict = {}
        for i in range(alo, ahi):
            j2lenget = j2len.get
            newj2len: dict = {}
            for j in b2j_get(a[i], nothing):
                if j < blo:
                    continue
                if j >= bhi:
                    break
                k = newj2len[j] = j2lenget(j - 1, 0) + 1
                if k > bestsize:
                    besti, bestj, bestsize = i - k + 1, j - k + 1, k
            j2len = newj2len
        # extend by equal elements on each end (bjunk is empty, so the
        # stdlib's junk-extension loops are unreachable)
        while besti > alo and bestj > blo and a[besti - 1] == b[bestj - 1]:
            besti, bestj, bestsize = besti - 1, bestj - 1, bestsize + 1
        while besti + bestsize < ahi and bestj + bestsize < bhi and \
                a[besti + bestsize] == b[bestj + bestsize]:
            bestsize += 1

        if bestsize:
            matching_blocks.append((besti, bestj, bestsize))
            if alo < besti and blo < bestj:
                queue.append((alo, besti, blo, bestj))
            if besti + bestsize < ahi and bestj + bestsize < bhi:
                queue.append((besti + bestsize, ahi, bestj + bestsize, bhi))
    matching_blocks.sort()

    # collapse adjacent blocks
    i1 = j1 = k1 = 0
    non_adjacent = []
    for i2, j2, k2 in matching_blocks:
        if i1 + k1 == i2 and j1 + k1 == j2:
            k1 += k2
        else:
            if k1:
                non_adjacent.append((i1, j1, k1))
            i1, j1, k1 = i2, j2, k2
    if k1:
        non_adjacent.append((i1, j1, k1))
    non_adjacent.append((la, lb, 0))

    # get_opcodes
    i = j = 0
    answer = []
    for ai, bj, size in non_adjacent:
        tag = ""
        if i < ai and j < bj:
            tag = "replace"
        elif i < ai:
            tag = "delete"
        elif j < bj:
            tag = "insert"
        if tag:
            answer.append((tag, i, ai, j, bj))
        i, j = ai + size, bj + size
        if size:
            answer.append(("equal", ai, i, bj, j))
    return answer


def readable_diff(before: str, after: str) -> str:
    """Word-level human-readable change report.

    Format parity with the reference's correction-changes artifact: each
    non-equal opcode rendered as ``...ctx «old» → «new» ctx...`` with three
    words of context from the *before* side, as a numbered list under a
    ``... correction changes (N edits):`` header.
    """
    if before == after:
        # byte-identical shortcut: difflib on equal sequences yields only
        # 'equal' opcodes → same report, minus the O(n²) matcher
        return "No changes detected."
    bw = before.split()
    aw = after.split()
    ctx_n = 3

    changes = []
    for op, i1, i2, j1, j2 in _fast_opcodes(bw, aw):
        if op == "equal":
            continue
        pre = bw[max(0, i1 - ctx_n):i1]
        post = bw[i2:i2 + ctx_n]
        old = " ".join(bw[i1:i2]) if i1 < i2 else ""
        new = " ".join(aw[j1:j2]) if j1 < j2 else ""

        parts = []
        if pre:
            parts.append("..." + " ".join(pre))
        if op == "replace":
            parts.append(f"«{old}» → «{new}»")
        elif op == "delete":
            parts.append(f"«{old}» → (deleted)")
        elif op == "insert":
            parts.append(f"(inserted) «{new}»")
        if post:
            parts.append(" ".join(post) + "...")
        changes.append(" ".join(parts))

    if not changes:
        return "No changes detected."
    header = f"Claude correction changes ({len(changes)} edits):\n"
    return header + "\n".join(f"  {i + 1}. {c}" for i, c in enumerate(changes))
