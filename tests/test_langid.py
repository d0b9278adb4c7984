"""Language identification (ops/langid.py): Cavnar-Trenkle ranked
char-n-gram profiles — the ccnet-style front door of the text-quality
family."""

from __future__ import annotations

from pyspark.sql import functions as F

from tdataframe_spark.ops.langid import (
    SEED_SENTENCES,
    langid_classify,
    langid_train,
)

# held-out sentences (never in SEED_SENTENCES) — the accuracy fixture
HELDOUT = {
    "en": [
        "the children walked slowly across the bridge in the morning fog",
        "nobody knew why the lights in the tower stayed on all night",
        "after dinner they sat in the garden and talked about the harvest",
        "the boat drifted past the harbor while the fishermen mended nets",
        "her grandmother kept every letter in a wooden box under the bed",
    ],
    "de": [
        "die kinder gingen am morgen langsam über die alte brücke",
        "niemand wusste warum das licht im turm die ganze nacht brannte",
        "nach dem essen saßen sie im garten und sprachen über die ernte",
        "das boot trieb am hafen vorbei während die fischer ihre netze flickten",
        "ihre großmutter bewahrte jeden brief in einer holzkiste auf",
    ],
    "fr": [
        "les enfants traversaient lentement le pont dans le brouillard",
        "personne ne savait pourquoi la lumière de la tour restait allumée",
        "après le dîner ils se sont assis dans le jardin pour parler",
        "le bateau dérivait près du port pendant que les pêcheurs travaillaient",
        "sa grand-mère gardait chaque lettre dans une boîte en bois",
    ],
    "es": [
        "los niños cruzaban despacio el puente en la niebla de la mañana",
        "nadie sabía por qué la luz de la torre seguía encendida de noche",
        "después de cenar se sentaron en el jardín a hablar de la cosecha",
        "el barco pasaba junto al puerto mientras los pescadores trabajaban",
        "su abuela guardaba cada carta en una caja de madera bajo la cama",
    ],
    "zh": [
        "孩子们在清晨的雾中慢慢地走过那座老桥",
        "没有人知道为什么塔上的灯整夜都亮着",
        "晚饭后他们坐在花园里谈论今年的收成",
        "渔民们修补渔网的时候小船慢慢漂过港口",
        "她的祖母把每一封信都保存在床下的木箱里",
    ],
}


def _seed_df(spark):
    return spark.createDataFrame(
        [(lang, t) for lang, ts in SEED_SENTENCES.items() for t in ts],
        "lang string, text string",
    )


def test_langid_heldout_accuracy_at_least_95pct(spark):
    """r6-VERDICT #8: the seed-trained classifier labels held-out
    mixed-language sentences (5 languages × 5 sentences, none seen in
    training) with ≥95% accuracy — in practice 25/25."""
    model = langid_train(_seed_df(spark))
    rows = [
        (i, lang, t)
        for i, (lang, t) in enumerate(
            (lang, t) for lang, ts in sorted(HELDOUT.items()) for t in ts
        )
    ]
    docs = spark.createDataFrame(rows, "doc_id long, truth string, text string")
    got = {
        r["doc_id"]: r["lang_pred"]
        for r in langid_classify(docs, model).collect()
    }
    truth = {i: lang for i, lang, _ in rows}
    acc = sum(got[i] == truth[i] for i in truth) / len(truth)
    assert acc >= 0.95, {
        i: (truth[i], got[i]) for i in truth if got[i] != truth[i]
    }


def test_langid_empty_text_and_partitioning_invariance(spark):
    """Empty/NULL text rows come back with NULL language and NULL distance
    (never a crash or an arbitrary label); output is identical under any
    input partitioning (all-integer distances, deterministic tie-break);
    every input id appears exactly once."""
    model = langid_train(_seed_df(spark))
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, ""),
        (3, None),
        (4, "das ist ein ganz normaler deutscher satz über den wald"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = langid_classify(docs, model).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert sorted(by_id) == [1, 2, 3, 4]
    assert by_id[1]["lang_pred"] == "en"
    assert by_id[4]["lang_pred"] == "de"
    for i in (2, 3):
        assert by_id[i]["lang_pred"] is None and by_id[i]["distance"] is None

    again = langid_classify(docs.repartition(7), model).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_langid_model_params_ride_the_model(spark):
    """ns/top_k travel inside the trained model (the params-on-data rule):
    classify uses the model's own profile geometry, so a model trained
    with non-default ns/top_k still classifies correctly."""
    model = langid_train(_seed_df(spark), ns=(2, 3), top_k=150)
    assert model["top_k"] == 150 and model["ns"] == [2, 3]
    assert all(len(p) <= 150 for p in model["profiles"].values())
    docs = spark.createDataFrame(
        [(1, "el perro corre por el campo junto al río cada mañana")],
        "doc_id long, text string",
    )
    got = langid_classify(docs, model).collect()[0]
    assert got["lang_pred"] == "es"
