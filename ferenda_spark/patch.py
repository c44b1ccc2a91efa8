"""Pre-parse patching — the patch_if_needed analog.

The reference applies unified-diff patch files (optionally rot13'd)
to downloaded text before parsing, returning (patchedtext,
description) (ref ferenda/documentrepository.py:1284-1333, using
whatthepatch/patchit). Here: a minimal unified-diff applier plus the
broadcast-dict application hook used by the extract stage — patches
are a rare-row branch, so the dict {url: (difftext, description)} is
broadcast and probed per document inside the Arrow UDF.
"""

from __future__ import annotations

import codecs


def apply_unified_diff(text: str, diff: str) -> str:
    """Apply a unified diff to ``text``. Strict: hunk context must
    match exactly (the reference fails the parse on patch failure,
    documentrepository.py:1329-1333); raises ValueError on mismatch."""
    lines = text.split("\n")
    out: list[str] = []
    pos = 0  # index into lines
    it = iter(diff.split("\n"))
    for dline in it:
        if dline.startswith(("---", "+++")) or not dline:
            continue
        if dline.startswith("@@"):
            # @@ -start,count +start,count @@
            try:
                old_range = dline.split()[1]  # -start[,count]
                old_start = int(old_range.lstrip("-").split(",")[0])
            except (IndexError, ValueError) as exc:
                raise ValueError("malformed hunk header: %r" % dline) from exc
            hunk_pos = old_start - 1 if old_start > 0 else 0
            if hunk_pos < pos:
                raise ValueError("overlapping hunks")
            out.extend(lines[pos:hunk_pos])
            pos = hunk_pos
        elif dline.startswith(" "):
            if pos >= len(lines) or lines[pos] != dline[1:]:
                raise ValueError("context mismatch at line %d" % (pos + 1))
            out.append(lines[pos])
            pos += 1
        elif dline.startswith("-"):
            if pos >= len(lines) or lines[pos] != dline[1:]:
                raise ValueError("delete mismatch at line %d" % (pos + 1))
            pos += 1
        elif dline.startswith("+"):
            out.append(dline[1:])
        else:
            raise ValueError("unexpected diff line: %r" % dline)
    out.extend(lines[pos:])
    return "\n".join(out)


def maybe_rot13(diff: str) -> str:
    """The reference stores some patches rot13'd with a marker first
    line (ref documentrepository.py:1305-1312)."""
    if diff.startswith("ROT13:"):
        return codecs.decode(diff[len("ROT13:"):], "rot13")
    return diff


def make_patch(old_text: str, new_text: str, rot13: bool = False) -> str:
    """Generate a unified diff that :func:`apply_unified_diff` applies
    back to ``new_text`` — the ``mkpatch`` devel tool analog (ref
    ferenda/devel.py mkpatch: capture a manual fix as a patch file).
    ``rot13=True`` produces the marker-prefixed obfuscated form some
    reference patch files use."""
    import difflib
    diff = "\n".join(difflib.unified_diff(
        old_text.split("\n"), new_text.split("\n"),
        fromfile="a", tofile="b", lineterm=""))
    if rot13:
        return "ROT13:" + codecs.encode(diff, "rot13")
    return diff


def patch_text(url: str, text: str, patches: dict | None):
    """→ (possibly patched text, description|None). ``patches``:
    {url: (difftext, description)} — the broadcast dict."""
    if not patches or url not in patches:
        return text, None
    diff, description = patches[url]
    return apply_unified_diff(text, maybe_rot13(diff)), description
