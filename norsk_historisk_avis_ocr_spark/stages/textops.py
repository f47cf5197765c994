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

import difflib
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
    """
    kept = []
    for line in text.split("\n"):
        if "|" in line:  # the pipe steps are no-ops otherwise
            line = _TRAILING_PIPE.sub("", line)
            line = _LEADING_PIPE.sub("", line)
            line = line.strip("|")
        line = line.rstrip()
        core = line.strip()
        if 0 < len(core) <= 2:
            # stray garbage; drop entirely so reflow can rejoin hyphens across
            # what would otherwise become a blank line
            continue
        kept.append(line)

    out = []
    blanks = 0
    for line in kept:
        if line.strip() == "":
            blanks += 1
            if blanks <= 1:
                out.append(line)
        else:
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
    for op, i1, i2, j1, j2 in difflib.SequenceMatcher(None, bw, aw).get_opcodes():
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
