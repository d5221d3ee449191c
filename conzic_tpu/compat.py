"""Reference-shaped compatibility surface.

Drop-in call signatures for code written against the reference modules
(``gen_utils.generate_caption``, ``control_gen_utils.control_generate_caption``,
``utils.*`` — /root/reference). The reference passes (model, clip,
tokenizer, token_mask) separately; in this framework those live inside a
:class:`~conzic_tpu.engine.sampler.Captioner`, so the shim accepts EITHER a
Captioner in the ``model`` slot (clip/tokenizer/token_mask then ignored) or
raises with a pointed migration message.

Usage for a reference user:

    from conzic_tpu import compat as gen_utils
    texts, scores = gen_utils.generate_caption(
        img_name, captioner, None, None, image_instance, None, logger,
        prompt=..., batch_size=..., max_len=..., top_k=..., ...)
"""

from __future__ import annotations

import numpy as np

from conzic_tpu.engine import sampler as _sampler
from conzic_tpu.engine.sampler import Captioner
from conzic_tpu.runtime.logging import create_logger  # noqa: F401 (utils parity)
from conzic_tpu.runtime.seeding import set_seed  # noqa: F401 (utils parity)


def _as_captioner(model) -> Captioner:
    if isinstance(model, Captioner):
        return model
    raise TypeError(
        "conzic_tpu.compat expects a conzic_tpu Captioner in the `model` "
        "argument slot (build one with Captioner.from_pretrained(config)); "
        "torch/HF model objects from the reference cannot run on TPU."
    )


def generate_caption(img_name, model, clip, tokenizer, image_instance,
                     token_mask, logger, prompt="", batch_size=1, max_len=15,
                     top_k=100, temperature=1.0, max_iter=500, alpha=0.7,
                     beta=1.0, generate_order="sequential"):
    """Signature parity with /root/reference/gen_utils.py:289-292."""
    return _sampler.generate_caption(
        img_name, _as_captioner(model), image_instance, logger,
        prompt=prompt, batch_size=batch_size, max_len=max_len, top_k=top_k,
        temperature=temperature, max_iter=max_iter, alpha=alpha, beta=beta,
        generate_order=generate_order,
    )


def control_generate_caption(img_name, model, clip, tokenizer, image_instance,
                             token_mask, logger, prompt="", batch_size=10,
                             max_len=25, top_k=100, temperature=1.0,
                             max_iter=500, alpha=0.7, beta=1.0, gamma=5.0,
                             ctl_type="sentiment", style_type="positive",
                             pos_type=None, generate_order="sequential"):
    """Signature parity with /root/reference/control_gen_utils.py:197-200."""
    return _sampler.control_generate_caption(
        img_name, _as_captioner(model), image_instance, logger,
        prompt=prompt, batch_size=batch_size, max_len=max_len, top_k=top_k,
        temperature=temperature, max_iter=max_iter, alpha=alpha, beta=beta,
        gamma=gamma, ctl_type=ctl_type, style_type=style_type,
        pos_type=pos_type, generate_order=generate_order,
    )


def get_init_text(tokenizer, seed_text, max_len, batch_size=1):
    """utils.py:46-51 parity: works with either our WordPieceTokenizer or a
    Captioner."""
    if isinstance(tokenizer, Captioner):
        return tokenizer.init_ids(seed_text, max_len, batch_size).tolist()
    text = seed_text + tokenizer.mask_token * max_len
    ids = tokenizer.encode(text)
    return [ids] * batch_size


def update_token_mask(tokenizer, token_mask, max_len, index):
    """utils.py:53-59 parity for host-side mask arrays (numpy).

    Accepts a Captioner, a tokenizer with ``.vocab``, or anything exposing
    ``.wp.vocab``; vocabularies without a ``'.'`` entry (possible for
    custom/byte-BPE vocabs) leave the mask unchanged instead of raising.
    """
    vocab = getattr(tokenizer, "vocab", None)
    if vocab is None:
        vocab = tokenizer.wp.vocab
    period = vocab.get(".")
    mask = np.asarray(token_mask).copy()
    if period is not None:
        mask[..., period] = 1.0 if index == max_len - 1 else 0.0
    return mask


def format_output(sample_num, final_caption, best_caption):
    from conzic_tpu.api.app import format_output as _fo

    return _fo(sample_num, final_caption, best_caption)
