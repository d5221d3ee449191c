#!/usr/bin/env python
"""Train tiny-but-SEMANTIC CLIP + BERT models on the synthetic shape world.

VERDICT r3 item 1: every pruned-tier quality cell was measured on random
weights whose cosines carry no semantics. Zero egress blocks downloading
checkpoints, not training small ones — this trainer renders a procedural
image-caption world (conzic_tpu/data/synthetic.py), trains a small CLIP
contrastively and a small BERT as an MLM over the captions, validates
that CLIPScore separates correct from shuffled/mismatched captions, and
saves a models/checkpoint.py directory that Captioner.from_tiny_dir (and
every CLI via --lm_model <dir>) loads directly. The trained-weights
quality cells (tools/trained_quality_cells.py) then give the Δcos gate
real meaning at every published operating point.

Reference semantics being protected: the Gibbs loop's CLIP-guided
scoring (/root/reference/gen_utils.py:76-92, clip/clip.py:86-98).

TPU-idiomatic training: the full dataset lives on-device (uint8 images +
tokenized captions), each dispatch runs a lax.scan over a chunk of steps
(data-dependent chain — the axon backend dedupes repeated identical
dispatches, CLAUDE.md), and batches are gathered on-device from index
arrays, so host<->device traffic is a few KB of indices per chunk.

Usage (serialize with any other TPU user):
  PYTHONPATH=/root/.axon_site:$PYTHONPATH JAX_PLATFORMS=axon \
    python tools/train_tiny.py --out trained_tiny
  python tools/train_tiny.py --out /tmp/tt --device cpu --smoke  # CI-sized
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.validate_pruning import session_tag  # noqa: E402


def small_bert_config(vocab_size: int, hidden: int = 128, heads: int = 4,
                      intermediate: int = 512, layers: int = 4):
    from conzic_tpu.models.configs import BertConfig

    return BertConfig(
        vocab_size=vocab_size, hidden_size=hidden, num_layers=layers,
        num_heads=heads, intermediate_size=intermediate,
        max_position_embeddings=64,
    )


def small_clip_config(text_vocab_size: int, eos_token_id: int,
                      text_layers: int = 4, hidden: int = 128,
                      heads: int = 4, intermediate: int = 512,
                      projection_dim: int = 64):
    from conzic_tpu.models.configs import (
        CLIPConfig, CLIPTextConfig, CLIPVisionConfig,
    )

    return CLIPConfig(
        text=CLIPTextConfig(
            vocab_size=text_vocab_size, hidden_size=hidden,
            num_layers=text_layers,
            num_heads=heads, intermediate_size=intermediate,
            max_position_embeddings=77,
            eos_token_id=eos_token_id,
        ),
        vision=CLIPVisionConfig(
            hidden_size=hidden, num_layers=4, num_heads=heads,
            intermediate_size=intermediate,
            image_size=64, patch_size=8,
        ),
        projection_dim=projection_dim,
        # training init: temperature 0.07 (ln(1/0.07) ~ 2.659); the
        # fitted value is saved with the params. Clamped at ln(100) in
        # the loss, as standard for CLIP training.
        logit_scale_init=2.6593,
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="trained_tiny")
    p.add_argument("--device", choices=["tpu", "cpu"], default="tpu")
    p.add_argument("--clip_steps", type=int, default=4000)
    p.add_argument("--bert_steps", type=int, default=3000)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--train_n", type=int, default=16384)
    p.add_argument("--val_n", type=int, default=512)
    p.add_argument("--vocab_size", type=int, default=4096)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--warmup", type=int, default=200)
    p.add_argument("--chunk", type=int, default=25,
                   help="train steps per device dispatch (lax.scan chunk)")
    p.add_argument("--clip_text_layers", type=int, default=4,
                   help="CLIP text-tower depth — deeper towers probe the "
                        "factorized stage-1's depth-fraction scaling "
                        "(fact<pct> transfer evidence)")
    p.add_argument("--world", choices=["tiny", "rich"], default="tiny",
                   help="rich = the mid-size world (VERDICT r4 item 3): "
                        "14-21-word two-object captions with ungrounded "
                        "valence adjectives (sentiment-efficacy channel)")
    p.add_argument("--hidden", type=int, default=128,
                   help="model width (both towers; VERDICT item 3 probes "
                        "the gate's width transfer at >=256)")
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--intermediate", type=int, default=0,
                   help="MLP width (0 = 4*hidden)")
    p.add_argument("--bert_layers", type=int, default=4)
    p.add_argument("--projection_dim", type=int, default=0,
                   help="CLIP projection dim (0 = hidden // 2)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save_dtype", choices=["bfloat16", "float32"],
                   default="bfloat16")
    p.add_argument("--smoke", action="store_true",
                   help="CI-sized run: tiny dataset/steps, still end-to-end")
    args = p.parse_args()
    if args.smoke:
        args.clip_steps = min(args.clip_steps, 30)
        args.bert_steps = min(args.bert_steps, 30)
        args.train_n = min(args.train_n, 256)
        args.val_n = min(args.val_n, 64)
        args.batch = min(args.batch, 32)
        args.chunk = min(args.chunk, 5)

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from conzic_tpu.runtime.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp
    import optax

    from conzic_tpu.data import synthetic as syn
    from conzic_tpu.models.bert import BertForMaskedLM
    from conzic_tpu.models.checkpoint import save_tiny_checkpoint
    from conzic_tpu.models.clip import CLIPModel
    from conzic_tpu.runtime.image import CLIP_MEAN, CLIP_STD
    from conzic_tpu.text.bpe import CLIPBPETokenizer
    from conzic_tpu.text.wordpiece import WordPieceTokenizer

    t0 = time.time()
    rng = np.random.RandomState(args.seed)

    # --- world + tokenizers -------------------------------------------------
    rich = args.world == "rich"
    wp_vocab = syn.make_tiny_wordpiece_vocab(args.vocab_size, rich=rich)
    staging = tempfile.mkdtemp(prefix="conzic_tiny_bpe_")
    bpe_vocab_file, bpe_merges_file = syn.make_word_bpe_files(
        list(wp_vocab), staging)
    bpe = CLIPBPETokenizer.from_files(bpe_vocab_file, bpe_merges_file)
    wp_path = os.path.join(staging, "vocab.txt")
    with open(wp_path, "w", encoding="utf-8") as f:
        for tok in sorted(wp_vocab, key=wp_vocab.get):
            f.write(tok + "\n")
    wp = WordPieceTokenizer.from_vocab_file(wp_path)

    print(f"[{time.time()-t0:6.1f}s] rendering {args.train_n}+{args.val_n} "
          f"scenes ...", flush=True)
    images, captions, scenes = syn.build_dataset(
        args.train_n + args.val_n, seed=args.seed + 1, rich=rich)
    val_sl = slice(args.train_n, None)

    # tokenize everything once (host)
    clip_ids, clip_mask = bpe.batch_encode(captions, max_length=24,
                                           pad_to_max=True)
    wp_rows = [wp.encode(c) for c in captions]
    S_wp = max(len(r) for r in wp_rows)
    pad_id = wp.vocab[wp.pad_token]
    wp_ids = np.full((len(wp_rows), S_wp), pad_id, np.int32)
    wp_mask = np.zeros((len(wp_rows), S_wp), np.int32)
    for i, r in enumerate(wp_rows):
        wp_ids[i, : len(r)] = r
        wp_mask[i, : len(r)] = 1

    # --- models ---------------------------------------------------------------
    inter = args.intermediate or 4 * args.hidden
    proj = args.projection_dim or args.hidden // 2
    bert_cfg = small_bert_config(
        wp.vocab_size, hidden=args.hidden, heads=args.heads,
        intermediate=inter, layers=args.bert_layers)
    clip_cfg = small_clip_config(
        bpe.vocab_size, bpe.eos_token_id,
        text_layers=args.clip_text_layers, hidden=args.hidden,
        heads=args.heads, intermediate=inter, projection_dim=proj)
    bert = BertForMaskedLM(bert_cfg, dtype=jnp.bfloat16)
    clip = CLIPModel(clip_cfg, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(args.seed)
    bert_params = bert.init_params(jax.random.fold_in(key, 0), seq_len=S_wp)
    clip_params = clip.init_params(jax.random.fold_in(key, 1))
    n_bert = sum(x.size for x in jax.tree.leaves(bert_params))
    n_clip = sum(x.size for x in jax.tree.leaves(clip_params))
    print(f"[{time.time()-t0:6.1f}s] params: bert {n_bert/1e6:.2f}M, "
          f"clip {n_clip/1e6:.2f}M; backend={jax.default_backend()}",
          flush=True)

    # --- device-resident dataset ----------------------------------------------
    d_images = jnp.asarray(images[: args.train_n])  # uint8 (N,64,64,3)
    d_cids = jnp.asarray(clip_ids[: args.train_n])
    d_cmask = jnp.asarray(clip_mask[: args.train_n])
    d_wids = jnp.asarray(wp_ids[: args.train_n])
    d_wmask = jnp.asarray(wp_mask[: args.train_n])
    mean = jnp.asarray(CLIP_MEAN)
    std = jnp.asarray(CLIP_STD)

    def pixels_of(idx):
        return (d_images[idx].astype(jnp.float32) / 255.0 - mean) / std

    def wd_mask(params):
        return jax.tree.map(lambda x: x.ndim >= 2, params)

    # --- CLIP contrastive ------------------------------------------------------
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, args.warmup, max(args.clip_steps, args.warmup + 1))
    tx_clip = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(sched, weight_decay=1e-4, mask=wd_mask),
    )
    opt_clip = tx_clip.init(clip_params)

    def clip_loss(params, idx):
        px = pixels_of(idx)
        img = clip.apply({"params": params}, px,
                         method=CLIPModel.encode_image).astype(jnp.float32)
        txt = clip.apply({"params": params}, d_cids[idx], d_cmask[idx],
                         method=CLIPModel.encode_text).astype(jnp.float32)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        scale = jnp.exp(jnp.clip(params["logit_scale"], 0.0, jnp.log(100.0)))
        logits = scale * img @ txt.T
        labels = jnp.arange(logits.shape[0])
        li = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        lt = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
        return (li.mean() + lt.mean()) / 2

    @jax.jit
    def clip_chunk(params, opt_state, idx_chunk):
        def body(carry, idx):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(clip_loss)(params, idx)
            updates, opt_state = tx_clip.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), idx_chunk)
        return params, opt_state, losses.mean()

    print(f"[{time.time()-t0:6.1f}s] CLIP: {args.clip_steps} steps @B="
          f"{args.batch} (chunks of {args.chunk})", flush=True)
    done = 0
    while done < args.clip_steps:
        k = min(args.chunk, args.clip_steps - done)
        idx = rng.randint(0, args.train_n, size=(k, args.batch)).astype(np.int32)
        clip_params, opt_clip, loss = clip_chunk(
            clip_params, opt_clip, jnp.asarray(idx))
        done += k
        if done % (args.chunk * 8) < args.chunk or done >= args.clip_steps:
            print(f"  clip step {done:5d}  loss {float(loss):.4f}  "
                  f"[{time.time()-t0:6.1f}s]", flush=True)

    # --- BERT MLM ---------------------------------------------------------------
    sched_b = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, args.warmup, max(args.bert_steps, args.warmup + 1))
    tx_bert = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(sched_b, weight_decay=1e-4, mask=wd_mask),
    )
    opt_bert = tx_bert.init(bert_params)
    mask_id = wp.mask_token_id
    special = jnp.asarray([wp.vocab[wp.pad_token], wp.vocab["[CLS]"],
                           wp.vocab["[SEP]"]], jnp.int32)

    def bert_loss(params, idx, key):
        ids = d_wids[idx]
        att = d_wmask[idx]
        maskable = att.astype(bool) & ~jnp.isin(ids, special)
        # mask rate per ROW, uniform in [0.15, 1.0]: the engine's initial
        # state is ALL slots masked ("[CLS] prompt [MASK]*L [SEP]"), so
        # high-rate rows keep the proposal distribution in-domain at
        # iteration 1, low-rate rows match late-iteration refinement
        k1, k2 = jax.random.split(key)
        rate = jax.random.uniform(k1, (ids.shape[0], 1), minval=0.15,
                                  maxval=1.0)
        m = (jax.random.uniform(k2, ids.shape) < rate) & maskable
        x = jnp.where(m, mask_id, ids)
        logits = bert.apply({"params": params}, x, att).astype(jnp.float32)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, ids)
        w = m.astype(jnp.float32)
        return (ce * w).sum() / jnp.maximum(w.sum(), 1.0)

    @jax.jit
    def bert_chunk(params, opt_state, idx_chunk, key):
        def body(carry, inp):
            params, opt_state = carry
            idx, i = inp
            loss, grads = jax.value_and_grad(bert_loss)(
                params, idx, jax.random.fold_in(key, i))
            updates, opt_state = tx_bert.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss
        steps = jnp.arange(idx_chunk.shape[0])
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (idx_chunk, steps))
        return params, opt_state, losses.mean()

    print(f"[{time.time()-t0:6.1f}s] BERT: {args.bert_steps} steps @B="
          f"{args.batch}", flush=True)
    done = 0
    chunk_i = 0
    while done < args.bert_steps:
        k = min(args.chunk, args.bert_steps - done)
        idx = rng.randint(0, args.train_n, size=(k, args.batch)).astype(np.int32)
        bert_params, opt_bert, loss = bert_chunk(
            bert_params, opt_bert, jnp.asarray(idx),
            jax.random.fold_in(key, 1000 + chunk_i))
        done += k
        chunk_i += 1
        if done % (args.chunk * 8) < args.chunk or done >= args.bert_steps:
            print(f"  bert step {done:5d}  loss {float(loss):.4f}  "
                  f"[{time.time()-t0:6.1f}s]", flush=True)

    # --- validation: do the weights carry semantics? ----------------------------
    print(f"[{time.time()-t0:6.1f}s] validating on {args.val_n} held-out "
          f"scenes", flush=True)
    val_imgs = jnp.asarray(images[val_sl])
    val_px = (val_imgs.astype(jnp.float32) / 255.0 - mean) / std
    val_caps = captions[val_sl.start:]
    vc_ids, vc_mask = bpe.batch_encode(val_caps, max_length=24,
                                       pad_to_max=True)
    # word-shuffled versions of the same captions (drop the final '.')
    shuf_caps = []
    for c in val_caps:
        words = c.split()
        body = words[:-1] if words[-1] == "." else words
        rng.shuffle(body)
        shuf_caps.append(" ".join(body) + " .")
    sc_ids, sc_mask = bpe.batch_encode(shuf_caps, max_length=24,
                                       pad_to_max=True)

    @jax.jit
    def embed_all(params, px, tids, tmask, sids, smask):
        img = clip.apply({"params": params}, px,
                         method=CLIPModel.encode_image).astype(jnp.float32)
        txt = clip.apply({"params": params}, tids, tmask,
                         method=CLIPModel.encode_text).astype(jnp.float32)
        shf = clip.apply({"params": params}, sids, smask,
                         method=CLIPModel.encode_text).astype(jnp.float32)
        n = lambda x: x / jnp.linalg.norm(x, axis=-1, keepdims=True)  # noqa: E731
        return n(img), n(txt), n(shf)

    img_e, txt_e, shf_e = embed_all(
        clip_params, val_px, jnp.asarray(vc_ids), jnp.asarray(vc_mask),
        jnp.asarray(sc_ids), jnp.asarray(sc_mask))
    sim = np.asarray(img_e @ txt_e.T)
    n_val = sim.shape[0]
    ranks = (-sim).argsort(axis=1)
    top1 = float((ranks[:, 0] == np.arange(n_val)).mean())
    top5 = float((ranks[:, :5] == np.arange(n_val)[:, None]).any(1).mean())
    diag = sim[np.arange(n_val), np.arange(n_val)]
    off = (sim.sum(1) - diag) / (n_val - 1)
    cos_shuf = np.asarray((img_e * shf_e).sum(-1))

    # BERT: masked-token top-1 accuracy at 15% on held-out captions
    v_wids = jnp.asarray(wp_ids[val_sl])
    v_wmask = jnp.asarray(wp_mask[val_sl])

    @jax.jit
    def bert_val(params, key):
        maskable = v_wmask.astype(bool) & ~jnp.isin(v_wids, special)
        m = (jax.random.uniform(key, v_wids.shape) < 0.15) & maskable
        x = jnp.where(m, mask_id, v_wids)
        logits = bert.apply({"params": params}, x, v_wmask)
        pred = logits.argmax(-1)
        hits = ((pred == v_wids) & m).sum()
        return hits / jnp.maximum(m.sum(), 1)

    mlm_acc = float(bert_val(bert_params, jax.random.fold_in(key, 999)))

    validation = {
        "clip_retrieval_top1": top1,
        "clip_retrieval_top5": top5,
        "cos_matched_mean": float(diag.mean()),
        "cos_mismatched_mean": float(off.mean()),
        "cos_shuffled_mean": float(cos_shuf.mean()),
        "separation_matched_minus_mismatched": float((diag - off).mean()),
        "separation_matched_minus_shuffled": float((diag - cos_shuf).mean()),
        "bert_masked_top1_acc": mlm_acc,
        "n_val": n_val,
    }
    print(json.dumps(validation, indent=1))

    meta = {
        "trainer": "tools/train_tiny.py",
        "session": session_tag(),
        "args": vars(args),
        "backend": jax.default_backend(),
        "params_m": {"bert": n_bert / 1e6, "clip": n_clip / 1e6},
        "dataset": {"train_n": args.train_n, "val_n": args.val_n,
                    "wp_vocab": wp.vocab_size, "bpe_vocab": bpe.vocab_size,
                    "wp_seq": S_wp},
        "validation": validation,
        "wall_s": round(time.time() - t0, 1),
    }
    save_tiny_checkpoint(
        args.out, bert_cfg, bert_params, clip_cfg, clip_params, wp_vocab,
        bpe_vocab_file, bpe_merges_file, meta=meta,
        save_dtype=args.save_dtype)
    print(f"[{time.time()-t0:6.1f}s] saved {args.out}")


if __name__ == "__main__":
    main()
