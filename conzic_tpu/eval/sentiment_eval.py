"""Sentence-level sentiment scoring (host side).

Equivalent of ``/root/reference/sentiments_classifer.py:9-48``: tokenize the
sentence, POS-tag it in context, map Penn tags to WordNet tags
(unmapped tags map to ``''``, which yields ZERO synsets — those words are
excluded from the score), and sum each remaining word's mean
SentiWordNet ``pos_score - neg_score`` over its tag-restricted synsets.
``negative`` control flips the sign (``:31-32``).

Uses the real NLTK pipeline when its data packs are installed; otherwise
falls back to the repo's built-in evaluators (regex tokenizer + curated
valence table from ``text.lexicons``) — the same dual story as the POS
evaluator (``eval/pos_eval.py``). The fallback is context-free per word but
still operates on the DECODED sentence, so subword pieces are merged into
real words first (unlike the in-loop per-token table).
"""

from __future__ import annotations

from typing import List, Sequence

from conzic_tpu.eval.ndiv import word_tokenize

# Penn -> WordNet tag map, verbatim from sentiments_classifer.py:17-20
TAG_MAP = {
    "NN": "n", "NNP": "n", "NNPS": "n", "NNS": "n", "UH": "n",
    "VB": "v", "VBD": "v", "VBG": "v", "VBN": "v", "VBP": "v", "VBZ": "v",
    "JJ": "a", "JJR": "a", "JJS": "a",
    "RB": "r", "RBR": "r", "RBS": "r", "RP": "r", "WRB": "r",
}


def _nltk_ready() -> bool:
    try:
        import nltk

        nltk.data.find("corpora/sentiwordnet")
        nltk.data.find("corpora/wordnet")
        nltk.data.find("taggers/averaged_perceptron_tagger")
        nltk.data.find("tokenizers/punkt")
        return True
    except (ImportError, LookupError):
        return False


def text_sentiment_score(text: str, negative: bool = False,
                         use_nltk: bool = None) -> float:
    """One sentence's sentiment score (sentiments_classifer.py:14-32)."""
    if use_nltk is None:
        use_nltk = _nltk_ready()
    words = word_tokenize(text)
    if use_nltk:
        from nltk import pos_tag
        from nltk.corpus import sentiwordnet

        word_tag = pos_tag(words)
        score = 0.0
        for w, penn in word_tag:
            syns = list(sentiwordnet.senti_synsets(w, TAG_MAP.get(penn, "")))
            if syns:
                score += sum(s.pos_score() - s.neg_score()
                             for s in syns) / len(syns)
    else:
        from conzic_tpu.text.lexicons import _NEGATIVE, _POSITIVE

        score = sum(
            _POSITIVE.get(w, _NEGATIVE.get(w, 0.0))
            for w in (w.lower() for w in words)
        )
    return -score if negative else score


def batch_texts_sentiment_scores(
    batch_texts: Sequence[str], negative: bool = False
) -> List[float]:
    """Per-sentence scores for a flat text batch
    (sentiments_classifer.py:35-48 without the softmax — the engine
    applies ``energies.sentiment_probs`` on device)."""
    use_nltk = _nltk_ready()
    return [
        text_sentiment_score(t, negative=negative, use_nltk=use_nltk)
        for t in batch_texts
    ]
