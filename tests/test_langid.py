"""Trigram language-ID: held-out snippets classify correctly (the seed
profiles must generalize past their own training text), the Spark plan
stays broadcast+window shaped, and degenerate inputs don't blow up."""

from __future__ import annotations

from etl_sentinel_imagery_spark.operators.langid import (
    char_trigrams,
    classify,
    train_profiles,
)

#: Held-out prose — none of these sentences appear in SEED_TEXT.
HELD_OUT = [
    ("en", "she opened the window and looked out at the quiet street below"),
    ("en", "we should bring some bread and cheese for the long journey north"),
    ("de", "sie öffnete das fenster und schaute auf die ruhige straße hinunter"),
    ("de", "wir sollten brot und käse für die lange reise nach norden mitbringen"),
    ("fr", "elle ouvrit la fenêtre et regarda la rue tranquille en bas"),
    ("fr", "nous devrions apporter du pain et du fromage pour le long voyage"),
    ("es", "ella abrió la ventana y miró la calle tranquila de abajo"),
    ("es", "deberíamos llevar pan y queso para el largo viaje hacia el norte"),
    ("it", "lei aprì la finestra e guardò la strada tranquilla di sotto"),
    ("it", "dovremmo portare pane e formaggio per il lungo viaggio verso nord"),
    ("pt", "ela abriu a janela e olhou para a rua tranquila lá embaixo"),
    ("pt", "devíamos levar pão e queijo para a longa viagem para o norte"),
]


def test_profiles_deterministic_and_bounded():
    a, b = train_profiles(), train_profiles()
    assert a == b
    for lang, prof in a.items():
        assert len(prof) <= 300
        assert set(prof.values()) == set(range(len(prof)))


def test_char_trigrams_padding():
    assert char_trigrams("ab") == [" ab", "ab "]
    assert char_trigrams("  spaced   out ") == char_trigrams("spaced out")


def test_held_out_snippets_classify_correctly(spark):
    docs = spark.createDataFrame(
        [(i, lang, text) for i, (lang, text) in enumerate(HELD_OUT)],
        "doc_id bigint, true_lang string, text string",
    )
    got = {r["doc_id"]: r["lang_pred"] for r in classify(docs).collect()}
    wrong = [
        (HELD_OUT[i][0], got.get(i), HELD_OUT[i][1])
        for i in range(len(HELD_OUT))
        if got.get(i) != HELD_OUT[i][0]
    ]
    assert not wrong, f"misclassified: {wrong}"


def test_degenerate_inputs(spark):
    docs = spark.createDataFrame(
        [(1, "the house is warm and the garden is green"), (2, ""), (3, "zz")],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r for r in classify(docs).collect()}
    assert rows[1]["lang_pred"] == "en"
    # empty/too-short docs produce no trigram evidence → no row (the
    # quarantine-not-crash contract)
    assert 2 not in rows


def test_plan_is_broadcast_join_shaped(spark):
    import io
    from contextlib import redirect_stdout

    docs = spark.createDataFrame(
        [(1, "some text about the weather today")], "doc_id bigint, text string"
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        classify(docs).explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
