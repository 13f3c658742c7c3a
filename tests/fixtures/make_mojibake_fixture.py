"""Generate mojibake.parquet — corrupted text with pinned repairs.

Corruption and verification both use Python's OWN codecs — not the
Spark translate/encode/decode chain under test:

  corrupt(text)  = text.encode('utf-8') decoded byte-by-byte with the
                   "sloppy cp1252" rule every real-world decoder uses
                   (cp1252 where defined, the raw C1 code point for
                   the five undefined bytes 81 8D 8F 90 9D);
  repair(garble) = the exact inverse, then a STRICT utf-8 decode.

Every corrupted row asserts repair(corrupt(text)) == text at build
time, so the pinned ``expected`` column is independently proven.
Clean rows (ASCII, Latin-1 accents, CJK) pin expected == corrupted
with expect_changed = false — the repair must refuse to touch them.

Columns: case_id BIGINT, corrupted VARCHAR, expected VARCHAR,
expect_changed BOOLEAN.

Run once: python tests/fixtures/make_mojibake_fixture.py
"""

from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

_SLOPPY_UNDEFINED = {0x81, 0x8D, 0x8F, 0x90, 0x9D}


def corrupt(text: str) -> str:
    out = []
    for b in text.encode("utf-8"):
        if b in _SLOPPY_UNDEFINED:
            out.append(chr(b))
        else:
            out.append(bytes([b]).decode("cp1252") if b >= 0x80 else chr(b))
    return "".join(out)


def repair(garbled: str) -> str:
    bs = bytearray()
    for ch in garbled:
        if ord(ch) < 0x100:
            bs.append(ord(ch))
        else:
            bs.append(ch.encode("cp1252")[0])
    return bs.decode("utf-8")  # strict: raises if not real mojibake


CORRUPTED_SOURCES = [
    "un café crème à l'été, s'il vous plaît",
    "die Straße war über Nacht völlig verschneit",
    "mañana habrá peñas en el cañón",
    "smart quotes “like these” and — yes — em dashes…",
    "curly apostrophe: it’s fine • bullet",
    "你好，世界",
    "emoji survives: 😀 🎉",
    "mixed: naïve café — “süß” …",
]

CLEAN_SOURCES = [
    "plain ascii stays plain ascii",
    "café",  # real Latin-1 accents: a lone 0xE9 is not valid UTF-8
    "São Paulo",
    "你好",  # real CJK: not Latin-1-shaped, ineligible
    "",
]


def main() -> None:
    rows = []
    cid = 0
    for src in CORRUPTED_SOURCES:
        cid += 1
        g = corrupt(src)
        assert g != src
        assert repair(g) == src, src
        rows.append((cid, g, src, True))
    # double corruption repairs exactly one level per pass
    cid += 1
    once = corrupt(CORRUPTED_SOURCES[0])
    twice = corrupt(once)
    assert repair(twice) == once
    rows.append((cid, twice, once, True))
    for src in CLEAN_SOURCES:
        cid += 1
        try:
            rep = repair(src)
        except (UnicodeDecodeError, UnicodeEncodeError):
            rep = src  # not byte-mappable / not valid UTF-8: untouched
        if rep == src or any(ord(c) > 0xFF and c not in
                             "€‚ƒ„…†‡ˆ‰Š‹ŒŽ‘’“”•–—˜™š›œžŸ" for c in src):
            rep = src  # ineligible or no-op: repair must keep original
        assert rep == src, f"clean text would be mangled: {src!r}"
        rows.append((cid, src, src, False))

    table = pa.table(
        {
            "case_id": pa.array([r[0] for r in rows], pa.int64()),
            "corrupted": pa.array([r[1] for r in rows], pa.string()),
            "expected": pa.array([r[2] for r in rows], pa.string()),
            "expect_changed": pa.array([r[3] for r in rows], pa.bool_()),
        }
    )
    out = Path(__file__).parent / "mojibake.parquet"
    pq.write_table(table, out)
    print(f"wrote {out}: {table.num_rows} rows")
    for r in rows:
        print(f"  case {r[0]:2d} changed={r[3]} {r[1][:48]!r}")


if __name__ == "__main__":
    main()
