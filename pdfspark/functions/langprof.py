"""Character-n-gram language profiles (Cavnar & Trenkle 1994,
"N-Gram-Based Text Categorization") for the language-ID operator.

Profiles are fit AT IMPORT TIME from the small in-repo seed corpus
below (self-contained — no external data): normalize to lowercase
letters, pad with spaces, count character trigrams, keep the
PROFILE_TOP most frequent ranked by (count desc, trigram asc). A
document is classified by building its own DOC_TOP-trigram rank
profile the same way and summing the out-of-place distance
|doc_rank - profile_rank| against each language (missing trigram =
PENALTY); smallest total wins, ties broken by LANGS order.

Everything here is deterministic and engine-portable: ranks are
integer windows over (count desc, trigram asc) — both Spark and
DuckDB sort these single-byte-class strings identically — and
distances are integer sums, so the DuckDB oracle twin
(oracle_pipeline.langid_sql) matches bit-for-bit with no float
boundaries. ``classify`` is the pure-Python reference the holdout
tests pin the Spark plan against.
"""

from __future__ import annotations

import re
from collections import Counter

N = 3
PROFILE_TOP = 200
DOC_TOP = 100
PENALTY = PROFILE_TOP

# Seed paragraphs, authored for this repo (ordinary prose; enough
# running text that the top-200 trigram ranks are stable).
SEEDS: dict[str, str] = {
    "en": (
        "The quality of the data that goes into a model decides most "
        "of what comes out of it. When we read a large collection of "
        "documents, we want to know which language each one is written "
        "in, how long it is, and whether the text looks like natural "
        "writing or like noise. The words that appear most often in "
        "English are short ones such as the, of, and, to and in, and "
        "they shape the letter patterns that make the language easy to "
        "recognize even from a small sample of text."
    ),
    "es": (
        "La calidad de los datos que entran en un modelo decide gran "
        "parte de lo que sale de ese modelo. Cuando leemos una "
        "coleccion grande de documentos, queremos saber en que idioma "
        "esta escrito cada uno, cuanto mide y si el texto parece "
        "escritura natural o ruido. Las palabras que aparecen con mas "
        "frecuencia en espanol son cortas, como de, la, que, el y en, "
        "y forman los patrones de letras que hacen que la lengua sea "
        "facil de reconocer incluso con una muestra pequena de texto."
    ),
    "de": (
        "Die Qualitaet der Daten, die in ein Modell eingehen, "
        "bestimmt einen grossen Teil dessen, was daraus wird. Wenn "
        "wir eine grosse Sammlung von Dokumenten lesen, wollen wir "
        "wissen, in welcher Sprache jedes einzelne geschrieben ist, "
        "wie lang es ist und ob der Text wie natuerliche Schrift oder "
        "wie Rauschen aussieht. Die haeufigsten Woerter im Deutschen "
        "sind kurze wie der, die, das, und und ist, und sie praegen "
        "die Buchstabenmuster, an denen man die Sprache schon an "
        "einer kleinen Probe erkennt."
    ),
    "fr": (
        "La qualite des donnees qui entrent dans un modele determine "
        "une grande partie de ce qui en sort. Quand nous lisons une "
        "grande collection de documents, nous voulons savoir dans "
        "quelle langue chacun est ecrit, quelle est sa longueur et si "
        "le texte ressemble a une ecriture naturelle ou a du bruit. "
        "Les mots les plus frequents en francais sont courts, comme "
        "le, la, les, des et est, et ils dessinent les motifs de "
        "lettres qui rendent la langue facile a reconnaitre meme sur "
        "un petit echantillon de texte."
    ),
}

LANGS = list(SEEDS)  # tie-break order: en, es, de, fr

_NORM_RE = re.compile(r"[^a-z]+")


def normalize_letters(text: str) -> str:
    return _NORM_RE.sub(" ", (text or "").lower()).strip()


def profile_ranks(text: str, top: int) -> dict[str, int]:
    """Trigram -> rank (1-based) of the padded normalized text."""
    p = f" {normalize_letters(text)} "
    counts = Counter(p[i:i + N] for i in range(len(p) - N + 1))
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:top]
    return {g: r for r, (g, _c) in enumerate(ranked, start=1)}


PROFILES: dict[str, dict[str, int]] = {
    lang: profile_ranks(seed, PROFILE_TOP) for lang, seed in SEEDS.items()
}


def classify(text: str) -> tuple[str, dict[str, int]]:
    """Pure-Python reference classifier (the Spark plan's pytest twin).
    Returns (pred_lang, per-language out-of-place distances)."""
    doc = profile_ranks(text, DOC_TOP)
    dists = {
        lang: sum(
            abs(dr - prof[g]) if g in prof else PENALTY
            for g, dr in doc.items()
        )
        for lang, prof in PROFILES.items()
    }
    best = min(dists.values()) if dists else 0
    pred = next(lg for lg in LANGS if dists.get(lg, 0) == best)
    return pred, dists
