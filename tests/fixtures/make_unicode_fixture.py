"""Generate unicode_nfc.parquet — denormalized text with pinned NFC
forms.

The pinned ``expected`` column is Python's ``unicodedata.normalize``
(UCD); at query time DuckDB's ``nfc_normalize`` (utf8proc) recomputes
the same transform — so the registered differential cross-checks THREE
independent normalization implementations (Spark-side pandas UDF =
unicodedata again, but through the Arrow/UTF8 round trip).

Denormalized inputs are CONSTRUCTED (NFD of composed text, explicit
singleton code points, explicit combining sequences) — never source
literals an editor might silently re-compose.

Cases cover the canonical-composition families: combining marks
(single and stacked), Hangul jamo -> syllable composition, singleton
replacements (Angstrom sign, ohm sign), strings already in NFC
(identity), and compatibility characters NFC must NOT touch (ligature
fi, circled digits, fullwidth forms — those are NFKC's job).

Columns: case_id BIGINT, denorm VARCHAR, expected VARCHAR,
expect_changed BOOLEAN.

Run once: python tests/fixtures/make_unicode_fixture.py
"""

import unicodedata
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq


def _nfd(s: str) -> str:
    return unicodedata.normalize("NFD", s)


#: denormalized / boundary inputs, constructed explicitly
CASES = [
    _nfd("café crème — naïve ñ"),            # combining acute/grave/…
    "Å ring, ȫ stacked",     # ring; umlaut+macron
    _nfd("각 한국어"),                          # Hangul jamo
    "Å angstrom sign, Ω ohm sign",   # NFC singletons
    "already composed: café mañana Å",         # NFC identity
    "ascii only stays put",                    # ASCII identity
    "ﬁ ligature, ① circled, Ａ fullwidth",  # NFKC-only
    "ȩ́ reorder: cedilla after acute",  # mark reordering
    "",                                        # empty
]


def main() -> None:
    rows = []
    for cid, src in enumerate(CASES, start=1):
        nfc = unicodedata.normalize("NFC", src)
        rows.append((cid, src, nfc, nfc != src))
    assert sum(r[3] for r in rows) >= 5, "fixture lost its hard cases"
    table = pa.table(
        {
            "case_id": pa.array([r[0] for r in rows], pa.int64()),
            "denorm": pa.array([r[1] for r in rows], pa.string()),
            "expected": pa.array([r[2] for r in rows], pa.string()),
            "expect_changed": pa.array([r[3] for r in rows], pa.bool_()),
        }
    )
    out = Path(__file__).parent / "unicode_nfc.parquet"
    pq.write_table(table, out)
    print(f"wrote {out} ({len(rows)} rows)")


if __name__ == "__main__":
    main()
