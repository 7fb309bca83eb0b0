"""code_signals / reading_level / charset_stats: crafted-fixture
semantics (fence/indent/symbol routes, syllable floors, codepoint-exact
ascii ratio incl. astral chars) and the no-shuffle plan pin."""

from loongcollector_spark.operators.text import (
    charset_stats,
    code_signals,
    reading_level,
)


def _one(spark, text):
    return spark.createDataFrame([(0, text)], "doc_id long, text string")


def test_code_signals_routes(spark):
    fenced = "intro\n```\nx = 1\n```"
    indented = "    a = 1\n    b = 2\n    c = 3"
    prose = "The quick brown fox jumps over the lazy dog. " * 3
    symbolic = "def f(x): return {x: (x+1)};"  # kw + symbol density
    rows = spark.createDataFrame(
        [(0, fenced), (1, indented), (2, prose), (3, symbolic)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in code_signals(rows).collect()}
    assert got[0].n_fences == 2 and got[0].is_code
    assert got[1].n_code_lines == 3 and got[1].is_code
    assert not got[2].is_code
    assert got[3].n_kw == 2 and got[3].is_code


def test_code_signals_tab_indent_counts(spark):
    r = code_signals(_one(spark, "a\n\tx=1\n\ty=2\n\tz=3")).first()
    assert r.n_code_lines == 3 and r.n_lines == 4 and r.is_code


def test_reading_level_known_sentence(spark):
    r = reading_level(_one(spark, "The cat sat.")).first()
    assert (r.n_words, r.n_sentences, r.n_syllables) == (3, 1, 3)
    assert r.flesch == round(206.835 - 1.015 * 3 - 84.6 * 1, 3)


def test_reading_level_floors(spark):
    # no-vowel words floor at 1 syllable each; zero [.!?] floors at 1
    r = reading_level(_one(spark, "tsk tsk")).first()
    assert (r.n_words, r.n_sentences, r.n_syllables) == (2, 1, 2)
    empty = reading_level(_one(spark, "   ")).first()
    assert empty.n_words == 0 and empty.flesch is None


def test_reading_level_vowel_groups_dont_span_words(spark):
    # 'ae io' = 2 groups (whitespace breaks a run), not 1
    r = reading_level(_one(spark, "ae io")).first()
    assert r.n_syllables == 2


def test_charset_counts(spark):
    r = charset_stats(_one(spark, "ok Ã© â€™ \x01\x02 �x")).first()
    assert r.n_replacement == 1
    assert r.n_control == 2
    assert r.n_mojibake == 2  # Ã and â€
    assert r.n_nonascii == 6  # Ã © â € ™ �


def test_charset_ratio_is_codepoint_exact_on_astral(spark):
    # U+1F389 is 2 UTF-16 units; a length()-based ratio would say 1/3
    r = charset_stats(_one(spark, "a\U0001F389")).first()
    assert r.n_nonascii == 1
    assert r.ascii_ratio == 0.5
    assert charset_stats(_one(spark, "")).first().ascii_ratio is None


def test_hygiene_ops_never_shuffle(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for op in (code_signals, reading_level, charset_stats):
        plan = op(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, op.__name__
