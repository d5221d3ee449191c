"""Control-energy table validation against a hand-derived gold set.

The reference's control energies run NLTK per candidate sentence
(/root/reference/sentiments_classifer.py:9-33, POS_classifier.py:6-31); the
rebuild's built-in tables approximate the per-word terms. This environment
has no NLTK data packs, so the gold below is hand-derived from the
reference algorithm's semantics:

  - POS gold: the NLTK universal tag (Penn tag -> universal mapping,
    POS_classifier.py:13 ``tagset='universal'``) the perceptron tagger
    assigns these words as standalone tokens — unambiguous closed-class
    words and strongly-typed open-class words only.
  - Sentiment gold: the SIGN of the SentiWordNet mean synset valence
    (``pos_score - neg_score`` averaged over ``senti_synsets(word)``,
    sentiments_classifer.py:26-30) for strongly-polar words, and exact 0
    for function words with no synsets.

Measured agreement is asserted against thresholds and recorded in
PARITY.md §Control energies.
"""

import numpy as np

from conzic_tpu.text.lexicons import (
    TAG_TO_ID,
    UNIVERSAL_TAGS,
    build_pos_table,
    build_sentiment_table,
)

# word -> universal tag as NLTK tags it standalone
POS_GOLD = {
    # DET (Penn DT)
    "the": "DET", "a": "DET", "an": "DET", "this": "DET", "that": "DET",
    "these": "DET", "those": "DET", "some": "DET", "any": "DET", "no": "DET",
    "each": "DET", "every": "DET", "another": "DET", "all": "DET",
    # ADP (Penn IN)
    "in": "ADP", "on": "ADP", "at": "ADP", "by": "ADP", "with": "ADP",
    "from": "ADP", "of": "ADP", "into": "ADP", "over": "ADP", "under": "ADP",
    "near": "ADP", "between": "ADP", "through": "ADP", "during": "ADP",
    "against": "ADP", "about": "ADP", "above": "ADP", "behind": "ADP",
    "below": "ADP", "beside": "ADP", "inside": "ADP", "outside": "ADP",
    "within": "ADP", "after": "ADP", "before": "ADP",
    # CONJ (Penn CC)
    "and": "CONJ", "or": "CONJ", "but": "CONJ", "nor": "CONJ",
    # PRON
    "i": "PRON", "you": "PRON", "he": "PRON", "she": "PRON", "it": "PRON",
    "we": "PRON", "they": "PRON", "him": "PRON", "her": "PRON",
    "them": "PRON", "his": "PRON", "its": "PRON", "their": "PRON",
    "who": "PRON", "what": "PRON", "something": "PRON", "someone": "PRON",
    "anything": "PRON", "everyone": "PRON",
    # PRT (Penn TO/RP/POS)
    "to": "PRT",
    # ADV (Penn RB)
    "very": "ADV", "too": "ADV", "also": "ADV", "then": "ADV", "now": "ADV",
    "never": "ADV", "always": "ADV", "often": "ADV", "again": "ADV",
    "here": "ADV", "there": "ADV", "quite": "ADV", "almost": "ADV",
    "away": "ADV", "quickly": "ADV", "slowly": "ADV", "happily": "ADV",
    "carefully": "ADV", "quietly": "ADV", "gently": "ADV", "really": "ADV",
    # VERB — auxiliaries + -ing/-ed forms (Penn VB*/MD)
    "is": "VERB", "are": "VERB", "was": "VERB", "were": "VERB", "be": "VERB",
    "been": "VERB", "am": "VERB", "has": "VERB", "have": "VERB",
    "had": "VERB", "do": "VERB", "does": "VERB", "did": "VERB",
    "will": "VERB", "would": "VERB", "can": "VERB", "could": "VERB",
    "should": "VERB", "may": "VERB", "must": "VERB",
    "running": "VERB", "sitting": "VERB", "standing": "VERB",
    "walking": "VERB", "playing": "VERB", "smiling": "VERB",
    "holding": "VERB", "wearing": "VERB", "looking": "VERB",
    "jumping": "VERB", "eating": "VERB", "sleeping": "VERB",
    "painted": "VERB", "dressed": "VERB", "covered": "VERB",
    # ADJ (Penn JJ)
    "big": "ADJ", "small": "ADJ", "red": "ADJ", "blue": "ADJ",
    "green": "ADJ", "black": "ADJ", "white": "ADJ", "old": "ADJ",
    "young": "ADJ", "good": "ADJ", "bad": "ADJ", "nice": "ADJ",
    "beautiful": "ADJ", "happy": "ADJ", "sad": "ADJ", "bright": "ADJ",
    "dark": "ADJ", "tall": "ADJ", "short": "ADJ", "colorful": "ADJ",
    "wonderful": "ADJ", "dangerous": "ADJ", "famous": "ADJ",
    "comfortable": "ADJ", "lovely": "ADJ",
    # NOUN (Penn NN/NNS)
    "dog": "NOUN", "cat": "NOUN", "girl": "NOUN", "boy": "NOUN",
    "man": "NOUN", "woman": "NOUN", "child": "NOUN", "tree": "NOUN",
    "flower": "NOUN", "sky": "NOUN", "water": "NOUN", "grass": "NOUN",
    "street": "NOUN", "park": "NOUN", "beach": "NOUN", "house": "NOUN",
    "car": "NOUN", "table": "NOUN", "chair": "NOUN", "hat": "NOUN",
    "dress": "NOUN", "shirt": "NOUN", "image": "NOUN", "picture": "NOUN",
    "photo": "NOUN", "person": "NOUN", "people": "NOUN", "bird": "NOUN",
    "horse": "NOUN", "mountain": "NOUN", "celebration": "NOUN",
    "happiness": "NOUN", "friendship": "NOUN", "movement": "NOUN",
    # NUM (Penn CD)
    "1": "NUM", "2": "NUM", "42": "NUM", "100": "NUM",
    # . (punctuation)
    ".": ".", ",": ".", "!": ".", "?": ".",
}

# word -> sign of the SentiWordNet mean valence (+1 / -1), or 0 for
# function words without synsets
SENTIMENT_GOLD_POSITIVE = (
    "good great nice beautiful happy lovely wonderful amazing excellent "
    "fantastic perfect awesome delightful charming pleasant joyful cheerful "
    "love sweet graceful adorable brilliant glad pleased delicious gorgeous "
    "stunning magnificent splendid superb fabulous"
).split()
SENTIMENT_GOLD_NEGATIVE = (
    "bad sad angry ugly terrible horrible awful nasty gloomy sick lonely "
    "afraid scared dangerous painful wrong hate miserable unhappy depressed "
    "annoying disgusting dreadful filthy rotten cruel evil grim bleak dismal"
).split()
SENTIMENT_GOLD_NEUTRAL = "the of and to in a with on at it".split()


def _vocab_of(words):
    return {w: i for i, w in enumerate(words)}


def test_pos_table_agreement_vs_gold():
    vocab = _vocab_of(list(POS_GOLD))
    table = build_pos_table(vocab, use_nltk=False)
    hits = sum(
        1
        for w, tag in POS_GOLD.items()
        if UNIVERSAL_TAGS[table[vocab[w]]] == tag
    )
    agreement = hits / len(POS_GOLD)
    # measured: record in PARITY.md when this moves
    assert agreement >= 0.92, f"POS gold agreement {agreement:.3f}"


def test_sentiment_table_sign_agreement_vs_gold():
    words = (
        SENTIMENT_GOLD_POSITIVE
        + SENTIMENT_GOLD_NEGATIVE
        + SENTIMENT_GOLD_NEUTRAL
    )
    vocab = _vocab_of(words)
    table = build_sentiment_table(vocab, use_nltk=False)
    pos_hits = sum(1 for w in SENTIMENT_GOLD_POSITIVE if table[vocab[w]] > 0)
    neg_hits = sum(1 for w in SENTIMENT_GOLD_NEGATIVE if table[vocab[w]] < 0)
    agreement = (pos_hits + neg_hits) / (
        len(SENTIMENT_GOLD_POSITIVE) + len(SENTIMENT_GOLD_NEGATIVE)
    )
    assert agreement >= 0.90, f"sentiment sign agreement {agreement:.3f}"
    # function words carry exactly zero valence in both implementations
    for w in SENTIMENT_GOLD_NEUTRAL:
        assert table[vocab[w]] == 0.0, w


def test_report_agreement_numbers(capsys):
    """Prints the measured numbers (pytest -s) so PARITY.md stays honest."""
    vocab = _vocab_of(list(POS_GOLD))
    table = build_pos_table(vocab, use_nltk=False)
    miss = [
        (w, tag, UNIVERSAL_TAGS[table[vocab[w]]])
        for w, tag in POS_GOLD.items()
        if UNIVERSAL_TAGS[table[vocab[w]]] != tag
    ]
    agreement = 1 - len(miss) / len(POS_GOLD)
    print(f"POS gold agreement: {agreement:.3f} ({len(POS_GOLD)} words); "
          f"misses: {miss}")
