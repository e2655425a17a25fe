"""Deterministic html→text and geo-record extraction (SURVEY.md §2.1 S3,
§2.8 F8, §8.2 — the byte-parity surface of BASELINE.json:15).

``extract_text`` is THE byte-parity invariant: the pipeline's recomputed
text must equal ``pages.text`` byte-for-byte per url. The spec (§8.2):

    decode UTF-8 (errors="replace")
    → strip <script>/<style> blocks
    → replace remaining tags with "\\n"
    → collapse [ \\t]+ → single space
    → collapse \\n{2,} → "\\n"
    → strip()

Geo records ride in ``<span class="geo-record">{json}</span>`` elements;
the extractor parses exactly those spans — no heuristics. Normalization
(§8.3) lives here too so engine and fixtures share one definition.
"""

from __future__ import annotations

import json
import re

from mergeaddressesandbuildings_spark import config

_SCRIPT_STYLE = re.compile(rb"<(script|style)\b.*?</\1\s*>", re.DOTALL | re.IGNORECASE)
_TAG = re.compile(r"<[^>]*>")
_SPACES = re.compile(r"[ \t]+")
_NEWLINES = re.compile(r"\n{2,}")
_GEO_SPAN = re.compile(
    rb'<span class="geo-record">(.*?)</span>', re.DOTALL
)
_WS = re.compile(r"\s+")


def extract_text(html: bytes) -> str:
    """§8.2 byte-parity text extraction. Pure and deterministic."""
    stripped = _SCRIPT_STYLE.sub(b"", html)
    text = stripped.decode("utf-8", errors="replace")
    text = _TAG.sub("\n", text)
    text = _SPACES.sub(" ", text)
    text = _NEWLINES.sub("\n", text)
    return text.strip()


def extract_geo_records(html: bytes, strict: bool = True) -> list[dict]:
    """Parse the page's geo-record spans → list of dicts, each annotated
    with ``record_idx`` (0-based position among ALL spans in the page —
    the §8.6 stable-id key).

    ``strict=False`` (the production-extraction default at scale) skips
    unparseable spans instead of failing the task; the skipped span still
    consumes its record_idx so ids stay stable under partial corruption.
    """
    records = []
    for idx, m in enumerate(_GEO_SPAN.finditer(html)):
        try:
            rec = json.loads(m.group(1).decode("utf-8"))
        except (json.JSONDecodeError, UnicodeDecodeError):
            if strict:
                raise
            continue
        rec["record_idx"] = idx
        records.append(rec)
    return records


def street_norm(s: str) -> str:
    """§8.3 street normalization: upper(trim(collapse_ws)) + suffix
    expansion of the LAST token via config.STREET_SUFFIX_EXPANSION."""
    s = _WS.sub(" ", s.strip()).upper()
    if not s:
        return s
    parts = s.split(" ")
    parts[-1] = config.STREET_SUFFIX_EXPANSION.get(parts[-1], parts[-1])
    return " ".join(parts)


def hn_norm(s: str) -> str:
    """§8.3 housenumber normalization: upper(trim(s))."""
    return s.strip().upper()
