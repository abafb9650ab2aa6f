"""Unit tests for the Gopher repetition filters
(`operators/repetition.py`) on handcrafted documents with
hand-computed expected fractions."""

from __future__ import annotations

from udacity_capstone_data_engineering_spark.operators.repetition import (
    repetition_flags,
)


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = repetition_flags(df, "text", "doc_id")
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_clean_doc_keeps(spark):
    # 6 distinct lines, all words distinct -> every repetition stat 0.
    text = "\n".join(f"alpha{i} beta{i} gamma{i}" for i in range(6))
    got = _run(spark, [(1, text)])[1]
    assert got["n_lines"] == 6
    assert got["dup_line_frac"] == 0.0
    assert got["dup_line_char_frac"] == 0.0
    assert got["dup_3gram_char_frac"] == 0.0
    # tokens span line breaks, so the widest 2-gram is "gammaI alphaJ"
    # (12 word chars, once); word_chars = 6 lines * (6+5+6) = 102
    assert got["top_2gram_char_frac"] == round(12 / 102, 6)
    assert got["keep"] is True


def test_duplicate_lines_flagged(spark):
    # "spam egg" x4 + 2 distinct lines: dup_lines=4/6 > 30%.
    lines = ["spam egg"] * 4 + ["alpha beta", "gamma delta"]
    got = _run(spark, [(7, "\n".join(lines))])[7]
    assert got["n_lines"] == 6
    assert got["dup_line_frac"] == round(4 / 6, 6)
    # dup chars = 4*8 = 32; line chars = 4*8 + 10 + 11 = 53
    assert got["dup_line_char_frac"] == round(32 / 53, 6)
    assert got["ok_dup_lines"] is False
    assert got["keep"] is False


def test_top_2gram_concentration(spark):
    # "to be to be to be or not" — top 2-gram "to be" occurs 3 times
    # (positions 1,3,5), word chars: to,be x3 (12) + or,not (5) = 17.
    got = _run(spark, [(3, "to be to be to be or not")])[3]
    assert got["top_2gram_char_frac"] == round(3 * 4 / 17, 6)
    assert got["ok_top_2gram"] is False  # 12/17 > 20%


def test_dup_3gram_chars(spark):
    # "a b c a b c" -> 3-grams: "a b c","b c a","c a b","a b c";
    # "a b c" occurs twice (3 chars each occurrence) -> 2*3=6 of 6 chars.
    got = _run(spark, [(4, "a b c a b c")])[4]
    assert got["dup_3gram_char_frac"] == 1.0
    assert got["ok_dup_3gram"] is False


def test_empty_and_whitespace_text(spark):
    got = _run(spark, [(5, ""), (6, "   \n  \n")])
    for d in (5, 6):
        assert got[d]["n_lines"] == 0
        assert got[d]["dup_line_frac"] == 0.0
        assert got[d]["top_2gram_char_frac"] == 0.0
        assert got[d]["keep"] is True


def test_threshold_boundary_integer_exact(spark):
    # Exactly 30% duplicated lines must PASS (<=, integer-compared):
    # 10 lines, 3 of them the same line.
    lines = ["dup line"] * 3 + [f"unique {i}" for i in range(7)]
    got = _run(spark, [(8, "\n".join(lines))])[8]
    assert got["dup_line_frac"] == 0.3
    assert got["ok_dup_lines"] is True
