"""RTF text extraction — the legacy office format a scraped corpus
still carries.

Pure-stdlib parser for the Rich Text Format (Microsoft's published
1.x spec): a 7-bit token stream of groups (``{``/``}``), control
words (``\\word`` with optional signed parameter, one trailing space
consumed), control symbols (``\\{`` ``\\}`` ``\\\\`` escapes,
``\\~`` nbsp, ``\\-``/``\\_`` hyphens), hex-escaped codepage bytes
(``\\'hh``, codepage from ``\\ansicpgN``, cp1252 default) and
Unicode escapes (``\\uN`` signed 16-bit, followed by ``\\ucN``-many
fallback characters to skip). Non-text destinations (font/color/
style tables, info, pict/object blobs, headers/footers, field
instructions) and all ``{\\*...}`` starred destinations are skipped
by group; ``\\par``/``\\line``/``\\row`` break lines, ``\\tab``/
``\\cell`` tab.

Hostile-input discipline (the functions/pdf.py contract): group
depth, output size and token count are budgeted; truncated input
yields the text seen so far rather than raising — one malformed file
must not abort a corpus scan. ``rtf_build`` authors spec bytes for
the gate/tests (escapes, codepage bytes, unicode-with-fallback), so
the reader is checked against independently hand-laid tokens.

Reference scope note: the reference engine has no document-format
surface; this completes the office menu beside functions/docx.py,
epub.py, pdf.py (LLM-pipeline extension surface).
"""

from __future__ import annotations

import re


class RtfError(ValueError):
    """Not RTF, or budget exceeded."""


# destinations whose group content is never body text
_SKIP_DESTS = {
    b"fonttbl", b"colortbl", b"stylesheet", b"info", b"pict",
    b"object", b"header", b"footer", b"headerl", b"headerr",
    b"headerf", b"footerl", b"footerr", b"footerf", b"fldinst",
    b"themedata", b"colorschememapping", b"datastore", b"xmlnstbl",
    b"listtable", b"listoverridetable", b"revtbl", b"generator",
}
_CW = re.compile(rb"([a-z]+)(-?\d+)? ?", re.A)


def rtf_text(data: bytes, max_chars: int = 8 << 20,
             max_depth: int = 128,
             max_tokens: int = 4_000_000) -> tuple:
    """(text, n_paragraphs) from RTF bytes. Paragraph breaks come from
    ``\\par``; n_paragraphs counts non-empty paragraphs. Raises
    RtfError only for a missing ``{\\rtf`` magic or a blown budget —
    truncation mid-group returns what was read."""
    if not data.startswith(b"{\\rtf"):
        raise RtfError("missing {\\rtf magic")
    out: list[str] = []
    out_len = 0
    # group state: (skipping, uc_fallback); \u fallback-skip counter
    # lives outside groups (it crosses none in practice)
    stack: list[tuple[bool, int]] = []
    skipping, uc = False, 1
    pend_skip = 0          # \uN fallback chars still to swallow
    pend_hi = None         # high surrogate awaiting its low half
    codepage = "cp1252"
    i, n, tokens = 0, len(data), 0

    def put(s: str):
        nonlocal out_len, pend_skip
        if skipping or not s:
            return
        if pend_skip:
            take = min(pend_skip, len(s))
            pend_skip -= take
            s = s[take:]
            if not s:
                return
        out.append(s)
        out_len += len(s)
        if out_len > max_chars:
            raise RtfError(f"text budget exceeded ({max_chars} chars)")

    while i < n:
        tokens += 1
        if tokens > max_tokens:
            raise RtfError(f"token budget exceeded ({max_tokens})")
        c = data[i]
        if c == 0x7B:  # {
            if len(stack) >= max_depth:
                raise RtfError(f"group depth exceeded ({max_depth})")
            stack.append((skipping, uc))
            i += 1
        elif c == 0x7D:  # }
            if stack:
                skipping, uc = stack.pop()
            i += 1
        elif c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            c2 = data[i]
            if c2 == 0x27:  # \'hh
                hh = data[i + 1:i + 3]
                i += 3
                if len(hh) == 2:
                    if pend_skip and not skipping:
                        pend_skip -= 1  # one \'hh = one fallback char
                        continue
                    try:
                        put(bytes.fromhex(hh.decode("ascii"))
                            .decode(codepage, errors="replace"))
                    except ValueError:
                        pass  # malformed hex: drop, keep scanning
            elif c2 == 0x2A:  # \* — starred destination: skip group
                skipping = True
                i += 1
            elif c2 in b"{}\\":
                put(chr(c2))
                i += 1
            elif c2 == 0x7E:  # \~ nbsp
                put(" ")
                i += 1
            elif c2 in b"-_":
                # \- is an OPTIONAL hyphen (a zero-width hyphenation
                # point, spec 1.9.1) — emitting a literal '-' would
                # inject dashes mid-word into extracted text (ADVICE
                # r9); \_ is the visible non-breaking hyphen
                if c2 == 0x5F:
                    put("‑")
                i += 1
            elif c2 == 0x0A or c2 == 0x0D:  # \<newline> = \par
                put("\n")
                i += 1
            else:
                m = _CW.match(data, i)
                if not m:
                    i += 1  # unknown control symbol: ignore
                    continue
                word, param = m.group(1), m.group(2)
                i = m.end()
                if word == b"u":
                    cp = int(param or 0)
                    if cp < 0:
                        cp += 65536
                    if not skipping:
                        # \uN is 16-bit: astral chars arrive as UTF-16
                        # surrogate PAIRS (two \uN, each with its own
                        # \ucN fallback) — combine them (Word writes
                        # them this way)
                        if 0xD800 <= cp < 0xDC00:
                            if pend_hi is not None:
                                put("�")  # lone high surrogate
                            pend_hi = cp
                        elif 0xDC00 <= cp < 0xE000 and pend_hi is not None:
                            put(chr(0x10000
                                    + ((pend_hi - 0xD800) << 10)
                                    + (cp - 0xDC00)))
                            pend_hi = None
                        else:
                            if pend_hi is not None:
                                put("�")
                                pend_hi = None
                            put(chr(cp) if not 0xDC00 <= cp < 0xE000
                                else "�")
                        pend_skip += uc
                elif word == b"uc":
                    uc = max(0, int(param or 1))
                elif word == b"ansicpg":
                    try:
                        "".encode(f"cp{int(param)}")
                        codepage = f"cp{int(param)}"
                    except (LookupError, TypeError, ValueError):
                        pass  # unknown codepage: keep cp1252
                elif word in (b"par", b"line", b"row", b"sect", b"page"):
                    put("\n")
                elif word in (b"tab", b"cell"):
                    put("\t")
                elif word == b"emdash":
                    put("—")
                elif word == b"endash":
                    put("–")
                elif word in (b"lquote", b"rquote"):
                    put("‘" if word == b"lquote" else "’")
                elif word in (b"ldblquote", b"rdblquote"):
                    put("“" if word == b"ldblquote" else "”")
                elif word == b"bin":
                    # raw binary blob: skip exactly param bytes
                    i += max(0, int(param or 0))
                elif word in _SKIP_DESTS:
                    skipping = True
        elif c in (0x0A, 0x0D):
            i += 1  # source newlines are not text
        else:
            j = i
            while j < n and data[j] not in (0x5C, 0x7B, 0x7D, 0x0A, 0x0D):
                j += 1
            put(data[i:j].decode("ascii", errors="replace"))
            i = j

    if pend_hi is not None and not skipping:
        # a lone high surrogate at END of input was silently dropped
        # before (ADVICE r9) — flush it as U+FFFD like the mid-stream
        # lone-surrogate paths do (appended directly: the \uc fallback
        # skip applies to SOURCE fallback chars, which EOF has none of)
        out.append("�")
    text = "".join(out)
    # normalize: strip trailing breaks, count non-empty paragraphs
    text = text.rstrip("\n")
    paras = [p for p in text.split("\n") if p.strip()]
    return text, len(paras)


def _escape_rtf(s: str) -> str:
    """Writer-side escaping: brace/backslash escapes, cp1252-able
    non-ASCII as \\'hh, the rest as \\uN with a '?' fallback."""
    out = []
    for ch in s:
        if ch in "{}\\":
            out.append("\\" + ch)
        elif ch == "\t":
            out.append("\\tab ")
        elif ch == "\n":
            out.append("\\line ")
        elif ord(ch) < 128:
            out.append(ch)
        else:
            try:
                b = ch.encode("cp1252")
                out.append(f"\\'{b[0]:02x}")
            except UnicodeEncodeError:
                cp = ord(ch)
                if cp > 0xFFFF:
                    # \uN is 16-bit: astral chars as a surrogate pair
                    cp -= 0x10000
                    for v in (0xD800 + (cp >> 10), 0xDC00 + (cp & 0x3FF)):
                        out.append(f"\\u{v - 65536}?")
                else:
                    if cp > 32767:
                        cp -= 65536
                    out.append(f"\\u{cp}?")
    return "".join(out)


def rtf_build(paragraphs: list[str]) -> bytes:
    """Author an RTF document from paragraph strings — header with a
    skippable font table and an ``{\\*\\generator}`` destination (so
    readers must prove they skip both), body paragraphs joined by
    ``\\par``."""
    body = "\\par ".join(_escape_rtf(p) for p in paragraphs)
    doc = ("{\\rtf1\\ansi\\ansicpg1252\\deff0"
           "{\\fonttbl{\\f0\\fnil Helvetica;}}"
           "{\\*\\generator accelerator_spark rtf_build;}"
           "\\f0\\fs20 " + body + "}")
    return doc.encode("ascii")
