"""Language-ID accuracy: the 10-language char-trigram scorer on mixed
fixtures, plus agreement between the Spark plan and the oracle's logic."""

from __future__ import annotations

FIXTURES = [
    ("de", "Der Schnellzug und die Bahn sind ein wichtiges Thema in der Stadt,"
           " und die Regierung hat eine Entscheidung getroffen."),
    ("de", "Ich habe ein Buch über die Geschichte der deutschen Sprache gelesen."),
    ("en", "The government of the country is going to publish the annual report"
           " and it is going to be interesting."),
    ("en", "This is the kind of thing that the people of the town are talking about."),
    ("es", "El gobierno de los ciudadanos ha publicado el informe que describe"
           " la situación de la región."),
    ("es", "Los estudiantes que estaban en el edificio salieron cuando sonó la alarma."),
    ("fr", "Le gouvernement a publié le rapport annuel des finances publiques et"
           " les résultats sont meilleurs que prévu."),
    ("fr", "Les habitants de la ville ont demandé que le maire explique la décision."),
    ("it", "Il governo che ha pubblicato il rapporto per la stampa è lo stesso che"
           " aveva promesso una decisione."),
    ("nl", "Het rapport van de regering is een belangrijk document voor het land"
           " en de mensen die er wonen."),
    ("pl", "Rząd nie opublikował jeszcze raportu, ale na pewno zrobi to przed"
           " końcem tego roku, ponieważ się zobowiązał."),
    ("pt", "O governo publicou um relatório sobre a situação da região que descreve"
           " a qualidade de vida da população."),
    ("ro", "Guvernul a publicat raportul anual despre situația din țară, pe care"
           " toți cetățenii îl pot citi cu interes."),
    ("sv", "Regeringen har publicerat en rapport om det som har hänt och det är"
           " viktigt för landet att läsa den."),
]


def test_lang_id_ngram_accuracy(spark):
    from datagouvfr_data_pipelines_spark.functions.text import lang_id_ngram

    df = spark.createDataFrame(
        [(i, lang, text) for i, (lang, text) in enumerate(FIXTURES)],
        "doc_id int, expected string, text string",
    )
    pred = lang_id_ngram(df, "doc_id", "text")
    joined = {r["doc_id"]: r for r in df.join(pred, "doc_id").collect()}
    wrong = [
        (r["expected"], r["lang"], r["text"][:40])
        for r in joined.values()
        if r["expected"] != r["lang"]
    ]
    assert not wrong, wrong


def test_lang_id_ngram_empty_and_numeric_are_und(spark):
    from datagouvfr_data_pipelines_spark.functions.text import lang_id_ngram

    df = spark.createDataFrame(
        [(1, ""), (2, "12345 67890"), (3, "  \t")],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r["lang"] for r in lang_id_ngram(df, "doc_id", "text").collect()}
    assert out == {1: "und", 2: "und", 3: "und"}
