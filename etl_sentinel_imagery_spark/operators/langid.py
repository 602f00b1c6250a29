"""N-gram language identification (Cavnar–Trenkle out-of-place method).

Upgrades the stopword-ratio heuristic in queries/text_q.py to the real
thing: per-language character-trigram RANK PROFILES trained from small
embedded seed corpora, classification by summed profile ranks.

Spark shape — the whole classifier is one declarative plan:

1. explode each doc's char trigrams (JVM ``sequence`` + ``substring``
   transform — no Python), carrying the doc's trigram COUNT as a
   length-arithmetic column (no second counting pass),
2. join the (lang, gram, rank) profile table — a few hundred rows per
   language, BROADCAST by construction,
3. per (doc, lang): matched count + rank sum in one aggregation
   (partial aggregation compresses the explode map-side); the
   out-of-place penalty for absent grams comes from the carried
   total column,
4. argmin per doc via a combinable min(struct(score, lang)) —
   no window.

Accuracy note: trigram profiles are the classic solution for
whitespace languages; the embedded seeds cover en/de/fr/es/it/pt.
Real deployments retrain ``train_profiles`` on their own corpus —
everything downstream is data, not code. The synthetic testdata's
``lang`` column is a random label over one shared vocabulary (verified
— text distribution is identical across labels), so accuracy tests run
on held-out REAL snippets instead; see tests/test_langid.py.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Profile length (top-N trigrams per language). 300 is the classic
#: Cavnar–Trenkle setting.
PROFILE_N = 300

#: Small seed corpora — ordinary prose, a few sentences per language.
SEED_TEXT = {
    "en": (
        "the quick brown fox jumps over the lazy dog and then it runs "
        "through the green fields where the children are playing with "
        "their friends in the warm light of the afternoon sun while the "
        "old man watches them from the wooden bench near the water and "
        "thinks about the years that have passed since he was young it is a truth universally acknowledged that a single man in possession of a good fortune must be in want of a wife and the people of the town said that this was the way of the world"
    ),
    "de": (
        "der schnelle braune fuchs springt über den faulen hund und "
        "läuft dann durch die grünen felder wo die kinder mit ihren "
        "freunden im warmen licht der nachmittagssonne spielen während "
        "der alte mann ihnen von der holzbank am wasser zusieht und an "
        "die jahre denkt die vergangen sind seit er jung war es ist eine allgemein anerkannte wahrheit dass ein mann der ein gutes vermögen besitzt eine frau braucht und die leute der stadt sagten dass dies der lauf der welt sei"
    ),
    "fr": (
        "le rapide renard brun saute par dessus le chien paresseux puis "
        "il court à travers les champs verts où les enfants jouent avec "
        "leurs amis dans la douce lumière du soleil de l'après-midi "
        "pendant que le vieil homme les regarde depuis le banc de bois "
        "près de l'eau et pense aux années qui ont passé depuis sa "
        "jeunesse c'est une vérité universellement reconnue qu'un homme qui possède une belle fortune doit chercher une femme et les gens de la ville disaient que c'était ainsi que va le monde"
    ),
    "es": (
        "el rápido zorro marrón salta sobre el perro perezoso y luego "
        "corre por los campos verdes donde los niños juegan con sus "
        "amigos en la cálida luz del sol de la tarde mientras el viejo "
        "hombre los mira desde el banco de madera junto al agua y "
        "piensa en los años que han pasado desde que era joven es una verdad universalmente reconocida que un hombre que posee una buena fortuna debe buscar una esposa y la gente de la ciudad decía que así era el mundo según la costumbre"
    ),
    "it": (
        "la veloce volpe marrone salta sopra il cane pigro e poi corre "
        "attraverso i campi verdi dove i bambini giocano con i loro "
        "amici nella calda luce del sole del pomeriggio mentre il "
        "vecchio uomo li guarda dalla panchina di legno vicino all'acqua "
        "e pensa agli anni che sono passati da quando era giovane è una verità universalmente riconosciuta che un uomo che possiede una buona fortuna debba cercare una moglie e la gente della città diceva che questo era il modo del mondo"
    ),
    "pt": (
        "a rápida raposa marrom pula sobre o cão preguiçoso e depois "
        "corre pelos campos verdes onde as crianças brincam com seus "
        "amigos na luz quente do sol da tarde enquanto o velho homem as "
        "observa do banco de madeira perto da água e pensa nos anos que "
        "se passaram desde que era jovem é uma verdade universalmente reconhecida que um homem que possui uma boa fortuna deve procurar uma esposa e as pessoas da cidade diziam que assim era o mundo segundo o costume"
    ),
}


def char_trigrams(text: str) -> list:
    t = " " + " ".join(str(text).lower().split()) + " "
    return [t[i : i + 3] for i in range(len(t) - 2)]


def train_profiles(
    corpus: dict | None = None, n: int = PROFILE_N
) -> dict:
    """lang → {gram: rank} (rank 0 = most frequent). Deterministic:
    frequency desc, gram asc on ties."""
    corpus = corpus if corpus is not None else SEED_TEXT
    out = {}
    for lang, text in corpus.items():
        counts = Counter(char_trigrams(text))
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:n]
        out[lang] = {g: r for r, (g, _) in enumerate(ranked)}
    return out


def profiles_df(spark, profiles: dict) -> DataFrame:
    rows = [
        (lang, gram, rank)
        for lang, p in profiles.items()
        for gram, rank in p.items()
    ]
    return spark.createDataFrame(rows, "lang string, gram string, rank int")


def classify(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    profiles: dict | None = None,
    n: int = PROFILE_N,
) -> DataFrame:
    """(id, lang_pred, lang_score) — lower score = better match.

    Score per (doc, lang) = Σ rank(gram) over the doc's trigrams, with
    every trigram ABSENT from that language's profile charged the
    out-of-place penalty ``n``. One explode + one broadcast join + two
    combinable aggregations (no window); trigram extraction is a JVM
    sequence/substring transform."""
    profs = profiles if profiles is not None else train_profiles(n=n)
    pdf = F.broadcast(profiles_df(docs.sparkSession, profs))
    norm = F.concat(
        F.lit(" "),
        F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " "),
        F.lit(" "),
    )
    # The doc's trigram COUNT is pure length arithmetic (norm is always
    # ≥ 2 chars; every position 1..len−2 yields one length-3 gram), so
    # it rides the explode as a column — no second explode/aggregation
    # pass over the corpus just to count grams (round 12; the old plan
    # scanned and exploded twice, then joined the totals back).
    total = F.when(
        F.length(norm) >= 3, (F.length(norm) - 2).cast("long")
    ).otherwise(F.lit(0).cast("long"))
    # NB sequence(1, 0) is DESCENDING in Spark — clamp the stop to ≥1
    # and drop short grams so empty/tiny docs contribute nothing
    grams = docs.select(
        F.col(id_col),
        total.alias("_total"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.length(norm) - 2, F.lit(1))),
                lambda i: norm.substr(i, F.lit(3)),
            )
        ).alias("gram"),
    ).filter(F.length("gram") == 3)
    # INNER profile join + carried total (round 12): unmatched grams
    # die at the broadcast join instead of flowing into the
    # aggregation (the out-of-place penalty they owe every language is
    # recovered from the arithmetic `_total` column), the old per-doc
    # totals join disappears, and the rank-1 window is replaced by a
    # combinable struct-MIN aggregation — min(struct(score, lang)) is
    # field-lexicographic, exactly the (score asc, lang asc) tie-break.
    # Docs matching no profile gram anywhere have no post-join rows and
    # are absent, the old inner-join semantics. Measured at sf0.1:
    # 4.1 s (two explodes + window) → 2.6-3.7 s; the 13-way
    # conditional-aggregate variant tried first read 7-8.6 s — more
    # per-row agg work than the explode pass it saved.
    scored = (
        grams.join(pdf, "gram")
        .groupBy(id_col, "lang", "_total")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum("rank").alias("_s"),
        )
    )
    per_lang = scored.select(
        id_col,
        "lang",
        (F.col("_s") + (F.col("_total") - F.col("_n")) * F.lit(n)).alias(
            "score"
        ),
    )
    best = per_lang.groupBy(id_col).agg(
        F.min(F.struct("score", "lang")).alias("_b")
    )
    return best.select(
        id_col,
        F.col("_b.lang").alias("lang_pred"),
        F.col("_b.score").alias("lang_score"),
    )
