"""Language-ID realism pin (round-7 verdict task #6): both identifiers —
the stopword-lexicon heuristic (q_lang_id_heuristic) and the trained
char-trigram NB (q_langid_nb) — must demonstrate their claim on a REAL
mixed-language corpus, not merely hash-stably process the shared-vocabulary
synthetic fixture. The corpus below is ordinary prose composed for this
test in the four supported languages (en/de/fr/es), a few sentences per
document, deliberately containing each language's natural function words.

Stated floors (asserted): NB accuracy >= 0.95, heuristic >= 0.85.
"""

from __future__ import annotations

import pytest

# fmt: off
CORPUS = {
    "en": [
        "the weather turned cold in the north and the rivers froze early this year",
        "a group of students walked to the library to borrow a stack of books about history",
        "she wanted to learn the piano and practiced every evening after the end of work",
        "the old bridge across the valley was closed to traffic for a month of repairs",
        "a letter arrived in the morning and the news inside changed the mood of the house",
        "the farmers planted rows of wheat and hoped the rain would come back to the fields",
        "he tried to explain the rules of the game to a friend who had never played it",
        "the museum opened a new wing full of paintings from the middle of the century",
        "a long road leads to the top of the hill and the view there is worth the climb",
        "the committee agreed to postpone the vote and to publish the report of the inquiry",
    ],
    "de": [
        "der alte Mann ging jeden Morgen durch das Dorf und kaufte ein frisches Brot",
        "die Kinder spielten im Garten und das Wetter war ein Geschenk des Sommers",
        "ein schwerer Sturm zog über die Berge und der Regen füllte die Flüsse",
        "das Konzert begann spät und die Musiker spielten bis tief in die Nacht",
        "der Lehrer erklärte die Aufgabe und ein Schüler stellte eine kluge Frage",
        "die Stadt baute eine neue Brücke und der Verkehr wurde endlich leiser",
        "ein kleines Café an der Ecke serviert den besten Kuchen und das beste Brot",
        "der Zug hatte Verspätung und die Reisenden warteten geduldig auf dem Bahnsteig",
        "das Buch lag auf dem Tisch und die Seiten waren voller handschriftlicher Notizen",
        "die Ernte war gut dieses Jahr und ein Fest wurde im ganzen Dorf gefeiert",
    ],
    "fr": [
        "le matin les rues du village sont calmes et un boulanger ouvre sa boutique",
        "la rivière traverse les champs et le pont ancien relie les deux rives",
        "un musicien jouait sur la place et les passants s'arrêtaient pour écouter",
        "le train arrive à midi et les voyageurs descendent avec leurs valises",
        "la bibliothèque garde les livres rares et un catalogue décrit chaque volume",
        "le jardin derrière la maison donne des légumes et un parfum de lavande",
        "les enfants vont à l'école le long du canal et un chien les accompagne",
        "la pluie tombe depuis le soir et les toits brillent sous les lampadaires",
        "un marché s'installe le samedi et les marchands vendent le fromage et le pain",
        "le professeur explique la leçon et les étudiants prennent des notes précises",
    ],
    "es": [
        "el pueblo celebra una fiesta y los vecinos preparan la plaza con luces",
        "el río baja de la montaña y los campos verdes beben su agua clara",
        "un maestro explica la lección y los alumnos escuchan con mucha atención",
        "el mercado abre temprano y los vendedores ofrecen fruta fresca y pan caliente",
        "la lluvia llegó por la tarde y el olor de la tierra mojada llenó las calles",
        "el tren cruza el valle y los pasajeros miran los olivos por la ventana",
        "una carta llegó el lunes y la noticia alegró a toda la familia del barrio",
        "el museo guarda cuadros antiguos y los visitantes recorren las salas en silencio",
        "la cosecha fue buena este año y los agricultores dieron gracias por el sol",
        "el puerto recibe barcos de pesca y los marineros descargan las cajas al amanecer",
    ],
}
# fmt: on

NB_FLOOR = 0.95
HEURISTIC_FLOOR = 0.85


@pytest.fixture(scope="module")
def realistic_docs_dir(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("langid_real")
    rows = []
    i = 0
    for lang, sents in CORPUS.items():
        for text in sents:
            rows.append((i, text, lang, "realism-fixture", len(text)))
            i += 1
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    return str(tmp)


def _declared() -> dict[int, str]:
    out, i = {}, 0
    for lang, sents in CORPUS.items():
        for _ in sents:
            out[i] = lang
            i += 1
    return out


def test_nb_langid_realistic_accuracy(spark, realistic_docs_dir):
    from timing_explorer_spark.plans import all_queries

    out = all_queries()["q_langid_nb"].build(spark, realistic_docs_dir).collect()
    assert len(out) == 40
    declared = _declared()
    acc = sum(r["predicted_lang"] == declared[r["doc_id"]] for r in out) / len(out)
    assert acc >= NB_FLOOR, f"NB accuracy {acc} below floor {NB_FLOOR}"


def test_heuristic_langid_realistic_accuracy(spark, realistic_docs_dir):
    from timing_explorer_spark.plans import all_queries

    out = (
        all_queries()["q_lang_id_heuristic"].build(spark, realistic_docs_dir).collect()
    )
    assert len(out) == 40
    acc = sum(r["predicted_lang"] == r["declared_lang"] for r in out) / len(out)
    assert acc >= HEURISTIC_FLOOR, (
        f"heuristic accuracy {acc} below floor {HEURISTIC_FLOOR}: "
        + str([(r["declared_lang"], r["predicted_lang"]) for r in out])
    )
