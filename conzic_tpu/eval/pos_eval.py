"""POS-template evaluation (host side).

Equivalent of ``/root/reference/POS_classifier.py``: tag captions with the
universal tagset, score template-match accuracy
(matched-slots / template-length, ``:18-27``) and histogram the tag at a
word position across a results file (``:40-65``). Uses NLTK when its
tagger data is installed, else the rule tagger from
``conzic_tpu.text.lexicons``.
"""

from __future__ import annotations

import argparse
import json
from typing import List, Sequence, Tuple

from conzic_tpu.eval.ndiv import word_tokenize
from conzic_tpu.text.lexicons import UNIVERSAL_TAGS, rule_tag


def tag_words(words: Sequence[str]) -> List[str]:
    try:
        from nltk import pos_tag

        return [t for _, t in pos_tag(list(words), tagset="universal")]
    except (ImportError, LookupError):
        return [rule_tag(w.lower()) for w in words]


def text_pos_analysis(text: str) -> List[str]:
    return tag_words(word_tokenize(text))


def batch_texts_pos_analysis(
    batch_texts: Sequence[str], pos_template: Sequence
) -> Tuple[List[List[str]], List[float]]:
    """Returns (tags per text, accuracy per text) — POS_classifier.py:6-31."""
    pos_tags: List[List[str]] = []
    pos_scores: List[float] = []
    total_num = len(pos_template)
    for text in batch_texts:
        res_tag = text_pos_analysis(text)
        if len(res_tag) <= total_num:
            cur_tag = res_tag + [""] * (total_num - len(res_tag))
        else:
            cur_tag = res_tag[:total_num]
        correct = 0
        for word_id, slot in enumerate(pos_template):
            # EXACT reference operator semantics (POS_classifier.py:23-26):
            # a list slot is membership; a STRING slot is Python substring
            # — so for flat string templates (the reference's own __main__
            # eval, :44) a short caption's ""-padded tags count as correct
            # for every non-empty slot, and only a bare "" slot (not [""]
            # or []) is auto-correct. Quirk preserved; see PARITY.md.
            if slot == "":
                correct += 1
            elif cur_tag[word_id] in slot:
                correct += 1
        pos_tags.append(res_tag)
        pos_scores.append(correct / total_num)
    return pos_tags, pos_scores


def histogram_position(captions: Sequence[str], word_id: int) -> dict:
    """Tag histogram at a fixed word position (POS_classifier.py:57-64)."""
    hist = {t: 0 for t in UNIVERSAL_TAGS}
    for cap in captions:
        tags = text_pos_analysis(cap)
        if word_id < len(tags):
            hist[tags[word_id]] = hist.get(tags[word_id], 0) + 1
    return hist


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("results_json", help="an iter_N.json results file")
    p.add_argument("--word_id", type=int, default=12)
    p.add_argument("--template", type=str, default=None,
                   help="JSON list template, e.g. '[[\"DET\"],[\"NOUN\"]]'")
    args = p.parse_args(argv)
    with open(args.results_json, encoding="utf-8") as f:
        res = json.load(f)
    captions: List[str] = []
    for v in (res.values() if isinstance(res, dict) else res):
        captions.extend(v if isinstance(v, list) else [v])
    if args.template:
        template = json.loads(args.template)
        _, scores = batch_texts_pos_analysis(captions, template)
        print("mean template accuracy:", sum(scores) / max(len(scores), 1))
    print("tag histogram at word", args.word_id, ":",
          histogram_position(captions, args.word_id))


if __name__ == "__main__":
    main()
