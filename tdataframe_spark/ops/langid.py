"""Language identification — the front door of the text-quality family
(ccnet-style pipelines run lang-id BEFORE lm_score/quality bucketing).

Method: Cavnar & Trenkle 1994 ("N-Gram-Based Text Categorization", the
classic textcat algorithm — what fastText-era pipelines used before
learned embeddings): each language's profile is its ``top_k`` most
frequent char n-grams RANKED; a document is labeled by the profile with
the smallest total rank displacement over the document's own top n-grams
(out-of-profile grams pay the maximum penalty ``top_k``). Rank-order
statistics make it robust to tiny training corpora — a smoothed
Naive-Bayes or centroid dot over the same grams is dominated by
universally-common grams / unseen-mass defaults at this data size (both
were tried and mislabeled most text).

Shape: no per-row vector ever materializes — n-grams explode to
(doc, gram, count) rows, per-doc ranks come from a doc-partitioned
window (never a global sort), scoring is one broadcast join against the
n_langs×top_k profile table plus a bounded doc×lang grid (n_langs-row
broadcast). Per-row cost is O(#grams + top_k·n_langs); driver state is
the profile table only — corpus-size-independent, the 100 TB path.

Determinism: integer counts, integer ranks (count-desc, gram-asc
tie-break), integer displacements — NO floating point anywhere, so the
output is bit-identical under any partitioning; distance ties go to the
lexicographically smallest language.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tdataframe_spark.core.partitioning import ensure_min_partitions


def _gram_counts(
    df: DataFrame,
    text_col: str,
    id_cols: list[str],
    ns: tuple[int, ...],
    max_chars: int = 4096,
) -> DataFrame:
    """(id_cols..., __g, __cnt): char-n-gram counts. Text is lowercased;
    runs of whitespace collapse to one space so formatting never shifts
    the profile; ``max_chars`` caps the profiled prefix (language is
    decided in the first kilobytes — an unbounded explode over book-size
    documents is pure cost). Each requested n tags its grams (``2:th``)
    so orders never collide.

    Plan shape matters here: the normalization (regex + lower) must run
    ONCE per row. Putting it inside a per-position HOF lambda re-runs it
    per GRAM (no CSE across lambda invocations, and CollapseProject
    inlines a projected column straight back into an adjacent Project's
    lambda — the repo-wide HOF pitfall; observed 46 s → ~2 s at sf0.1).
    The explode/Generate node between the normalizing Project and the
    substring Project is the barrier that makes the once-per-row
    evaluation stick."""
    norm = F.substring(
        F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "),
        1,
        max_chars,
    )
    # a small-file corpus arrives as ONE scan partition — without this
    # the whole explode pipeline (the op's entire cost) runs single-task
    with_text = ensure_min_partitions(df).select(*id_cols, norm.alias("__t"))
    # one row per character position (Generate = the collapse barrier);
    # sequence(1, len) is ASCENDING for len >= 1, and NULL/empty text
    # yields no positions at all
    positions = with_text.filter(F.length("__t") >= 1).select(
        *id_cols,
        "__t",
        F.explode(F.sequence(F.lit(1), F.length("__t"))).alias("__i"),
    )
    grams = positions.select(
        *id_cols,
        F.explode(
            F.array(
                *[
                    F.when(
                        F.col("__i") <= F.length("__t") - n + 1,
                        F.concat(
                            F.lit(f"{n}:"),
                            F.col("__t").substr(F.col("__i"), F.lit(n)),
                        ),
                    )
                    for n in ns
                ]
            )
        ).alias("__g"),
    ).filter(F.col("__g").isNotNull())
    return grams.groupBy(*id_cols, "__g").agg(F.count(F.lit(1)).alias("__cnt"))


def _ranked(counts: DataFrame, part_cols: list[str], top_k: int) -> DataFrame:
    """rank 1..top_k per partition key by (count desc, gram asc) — the
    deterministic Cavnar-Trenkle profile order. Window is partitioned by
    the key (doc or language), never global."""
    w = Window.partitionBy(*part_cols).orderBy(
        F.col("__cnt").desc(), F.col("__g").asc()
    )
    return (
        counts.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= top_k)
    )


def langid_train(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    ns: tuple[int, ...] = (1, 2, 3),
    top_k: int = 300,
    max_chars: int = 4096,
) -> dict:
    """Build per-language ranked n-gram profiles from a labeled corpus.
    Returns a model dict; ns/top_k MUST ride the model — re-passing them
    at classify time is the parameter-drift bug class. Driver state is
    n_langs × top_k (gram, rank) pairs, corpus-size-independent."""
    rows = _ranked(
        _gram_counts(labeled, text_col, [label_col], ns, max_chars),
        [label_col],
        top_k,
    ).collect()
    profiles: dict[str, dict[str, int]] = {}
    for r in rows:
        profiles.setdefault(r[label_col], {})[r["__g"]] = r["__r"]
    return {"ns": list(ns), "top_k": top_k, "profiles": profiles}


def langid_classify(
    df: DataFrame,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "lang_pred",
    max_chars: int = 4096,
) -> DataFrame:
    """Label every row with the language whose ranked profile is nearest
    (smallest total rank displacement over the document's own top
    ``top_k`` grams; a gram absent from a language's profile pays the
    maximum displacement ``top_k``). Returns (id_col, out_col, distance);
    rows whose text yields no n-grams (empty/NULL) come back with NULL
    language and NULL distance. All-integer arithmetic — bit-identical
    under any partitioning."""
    spark = df.sparkSession
    ns, top_k = tuple(model["ns"]), model["top_k"]
    prof = spark.createDataFrame(
        [
            (lang, g, r)
            for lang, grams in sorted(model["profiles"].items())
            for g, r in sorted(grams.items())
        ],
        "__lang string, __g string, __lr int",
    )
    langs = spark.createDataFrame(
        [(lang,) for lang in sorted(model["profiles"])], "__lang string"
    )
    # max_chars is a read-cost knob, not model geometry: grams from a
    # capped prefix still join the same profiles, so any cap is
    # model-compatible — classification cost must not scale with
    # document length when the answer is decided in the first KBs.
    # persist: docprof feeds matched AND totals — without truncation the
    # whole explode+rank pipeline re-executes once per consumer branch
    # (observed 4x). A persist truncates exactly like the eager
    # localCheckpoint this used (each branch plans an InMemoryRelation
    # scan) but WITHOUT spending a separate materialization job up
    # front: the first real action fills the cache in-stage. docprof is
    # deterministic (total-order window ranking), so a recompute after
    # eviction cannot change values.
    docprof = (
        _ranked(
            _gram_counts(df, text_col, [id_col], ns, max_chars),
            [id_col],
            top_k,
        )
        .select(id_col, "__g", F.col("__r").alias("__dr"))
        .persist()
    )
    matched = (
        docprof.join(F.broadcast(prof), "__g")
        .groupBy(id_col, "__lang")
        .agg(
            F.sum(F.abs(F.col("__dr") - F.col("__lr"))).alias("__md"),
            F.count(F.lit(1)).alias("__mc"),
        )
    )
    # bounded doc × language grid (n_langs-row broadcast) so a language
    # matching NONE of the doc's grams still scores all-out-of-place
    totals = docprof.groupBy(id_col).agg(F.count(F.lit(1)).alias("__n"))
    scored = (
        totals.crossJoin(F.broadcast(langs))
        .join(matched, [id_col, "__lang"], "left")
        .select(
            id_col,
            "__lang",
            (
                F.coalesce("__md", F.lit(0))
                + (F.col("__n") - F.coalesce("__mc", F.lit(0)))
                * F.lit(top_k)
            ).alias("__d"),
        )
    )
    # deterministic argmin, ties to the lexicographically SMALLEST lang:
    # struct ordering compares __d first, then __lang — one aggregate
    # replaces the min-join-filter-regroup chain (and scored now has a
    # single consumer, so no checkpoint is needed)
    tied = (
        scored.groupBy(id_col)
        .agg(F.min(F.struct("__d", "__lang")).alias("__w"))
        .select(
            id_col,
            F.col("__w.__lang").alias(out_col),
            F.col("__w.__d").alias("distance"),
        )
    )
    from tdataframe_spark.core.caching import tie_cache_lifetimes

    return tie_cache_lifetimes(
        df.select(id_col).distinct().join(tied, id_col, "left").select(
            id_col, out_col, "distance"
        ),
        docprof,
    )


# Tiny built-in training corpus (ordinary sentences, composed for this
# engine) — enough signal for char-n-gram profiles of five languages.
# Real deployments pass their own labeled sample to langid_train.
SEED_SENTENCES: dict[str, list[str]] = {
    "en": [
        "the weather was cold and the children stayed home from school",
        "she opened the window and looked out over the quiet street",
        "we are going to the market to buy bread and cheese for dinner",
        "the old library on the corner closes early on sunday afternoons",
        "he wrote a long letter to his brother about the journey north",
        "the river runs slowly through the valley past the small farms",
        "they planted trees along the road during the first week of spring",
        "a light rain fell while the train waited at the empty station",
        "many people believe the castle on the hill is the oldest building",
        "please bring your umbrella because the sky looks very dark today",
    ],
    "de": [
        "das wetter war kalt und die kinder blieben zu hause",
        "sie öffnete das fenster und schaute auf die ruhige straße hinaus",
        "wir gehen zum markt um brot und käse für das abendessen zu kaufen",
        "die alte bibliothek an der ecke schließt sonntags sehr früh",
        "er schrieb seinem bruder einen langen brief über die reise",
        "der fluss fließt langsam durch das tal an den kleinen höfen vorbei",
        "sie pflanzten bäume entlang der straße in der ersten frühlingswoche",
        "ein leichter regen fiel während der zug am leeren bahnhof wartete",
        "viele leute glauben dass das schloss auf dem hügel sehr alt ist",
        "bitte bring deinen schirm mit denn der himmel sieht heute dunkel aus",
    ],
    "fr": [
        "le temps était froid et les enfants sont restés à la maison",
        "elle a ouvert la fenêtre et regardé la rue tranquille",
        "nous allons au marché pour acheter du pain et du fromage",
        "la vieille bibliothèque du coin ferme tôt le dimanche",
        "il a écrit une longue lettre à son frère au sujet du voyage",
        "la rivière coule lentement dans la vallée devant les petites fermes",
        "ils ont planté des arbres le long de la route au début du printemps",
        "une pluie légère tombait pendant que le train attendait en gare",
        "beaucoup de gens pensent que le château sur la colline est ancien",
        "prends ton parapluie car le ciel est très sombre aujourd'hui",
    ],
    "es": [
        "el tiempo era frío y los niños se quedaron en casa",
        "ella abrió la ventana y miró hacia la calle tranquila",
        "vamos al mercado a comprar pan y queso para la cena",
        "la vieja biblioteca de la esquina cierra temprano los domingos",
        "escribió una larga carta a su hermano sobre el viaje al norte",
        "el río corre despacio por el valle junto a las pequeñas granjas",
        "plantaron árboles a lo largo del camino en la primera semana",
        "una lluvia ligera caía mientras el tren esperaba en la estación",
        "mucha gente cree que el castillo de la colina es muy antiguo",
        "trae tu paraguas porque el cielo está muy oscuro hoy",
    ],
    "zh": [
        "今天天气很冷孩子们都待在家里没有去上学",
        "她打开窗户看着外面安静的街道",
        "我们去市场买面包和奶酪准备晚饭",
        "街角的老图书馆星期天很早就关门了",
        "他给哥哥写了一封关于北方旅行的长信",
        "河水缓缓地流过山谷经过那些小农场",
        "春天的第一个星期他们沿着道路种了许多树",
        "火车在空荡荡的车站等候时下起了小雨",
        "很多人相信山上的城堡是这里最古老的建筑",
        "请带上你的雨伞因为今天天空看起来很暗",
    ],
}
