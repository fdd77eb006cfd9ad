# Derive the corpus-frequency CJK dictionary shipped as
# src/main/resources/graft/cjk_dict.txt (SURVEY.md §2.3 U2).
#
# One-off DEV tool (duckdb is driver-side tooling, not a library
# dependency): counts all 2..4-char CJK character n-grams across the
# reference's committed danmaku corpora and keeps the top-K per length.
# Forward-maximum-match against this list is the jieba stand-in — the
# dictionary is corpus-derived data, the segmenter stays pure Scala
# (expr/TextFunctions.scala). Deterministic: ties broken by gram text.
import duckdb

TOP = {2: 1200, 3: 500, 4: 300}
OUT = "/root/repo/src/main/resources/graft/cjk_dict.txt"

con = duckdb.connect()
rows = []
for L, k in TOP.items():
    q = f"""
      WITH t AS (
        SELECT text FROM read_csv('/root/repo/refdata/*/danmaku_*.csv',
                                  header=true, all_varchar=true)
        WHERE text IS NOT NULL AND length(text) >= {L}),
      g AS (
        SELECT substr(text, i.i, {L}) AS gram
        FROM t, LATERAL (SELECT unnest(generate_series(1, length(text) - {L} + 1)) AS i) i)
      SELECT gram, count(*) AS c FROM g
      WHERE regexp_matches(gram, '^[{chr(0x4E00)}-{chr(0x9FFF)}]{{{L}}}$')
      GROUP BY 1 ORDER BY c DESC, gram LIMIT {k}"""
    rows += [(g, c, L) for g, c in con.execute(q).fetchall()]

# Frequency-desc across lengths for inspectability; the loader sorts
# into a Set anyway. Header lines (#) are ignored by the loader.
rows.sort(key=lambda r: (-r[1], r[0]))
with open(OUT, "w", encoding="utf-8") as f:
    f.write("# CJK max-match dictionary derived from the reference's committed\n")
    f.write("# danmaku corpora by tools/derive_cjk_dict.py (top 2/3/4-gram\n")
    f.write("# frequencies; deterministic). One word per line.\n")
    for g, c, L in rows:
        f.write(g + "\n")
print(f"wrote {len(rows)} entries to {OUT}")
