"""Batched directory captioning CLI — reference ``run.py`` equivalent.

Flow parity with ``/root/reference/run.py:114-222``: iterate an image
directory in batches (``drop_last=True``, ``:178``), accumulate
``all_results[iter_id][image_id] = caption`` (``:86-93``) and write
``results/<config>/sample_<i>/iter_<j>.json`` + ``best_clipscore.json``
(``:194-222``) — the artifact layout consumed by the diversity/POS eval
scripts.

Images in one batch are captioned by ONE jit-compiled program; per-image
failures skip the image (the reference's only fault handling,
clipretrieval.py:121-127, promoted here to the batch runner).
"""

from __future__ import annotations

import argparse
import json
import os

from conzic_tpu.config import add_reference_args, config_from_args
from conzic_tpu.api.demo import build_captioner
from conzic_tpu.engine.sampler import control_generate_caption, generate_caption
from conzic_tpu.runtime.logging import (
    create_logger,
    run_log_filename,
    run_type_label,
)
from conzic_tpu.runtime.seeding import set_seed


def iter_image_batches(dir_path: str, batch_size: int, logger):
    """Yields (pil_images, names) of exactly batch_size (drop_last=True)."""
    from PIL import Image

    names = sorted(os.listdir(dir_path))  # deterministic batching
    batch_imgs, batch_names = [], []
    for name in names:
        try:
            img = Image.open(os.path.join(dir_path, name)).convert("RGB")
        except Exception as e:
            logger.info(f"skipping unreadable image {name}: {e}")
            continue
        batch_imgs.append(img)
        batch_names.append(name)
        if len(batch_imgs) == batch_size:
            yield batch_imgs, batch_names
            batch_imgs, batch_names = [], []
    # trailing partial batch dropped (reference run.py:178 drop_last=True)


def accumulate(all_results, img_names, gen_texts):
    for iter_id, gen_text_list in enumerate(gen_texts):
        for jj in range(len(gen_text_list)):
            image_id = img_names[jj].split(".")[0]
            if all_results[iter_id] is None:
                all_results[iter_id] = {image_id: gen_text_list[jj]}
            else:
                all_results[iter_id][image_id] = gen_text_list[jj]
    return all_results


def save_results(cfg, run_type, all_results, sample_id):
    kind = "caption" if cfg.run_type == "caption" else run_type
    save_dir = (
        f"{cfg.results_dir}/{kind}_{cfg.order}_len{cfg.sentence_len}"
        f"_topk{cfg.candidate_k}_alpha{cfg.alpha:.3f}_beta{cfg.beta:.3f}"
        f"_gamma{cfg.gamma:.3f}_lmTemp{cfg.lm_temperature:.3f}/sample_{sample_id}"
    )
    os.makedirs(save_dir, exist_ok=True)
    for iter_id in range(len(all_results)):
        name = (
            f"iter_{iter_id}.json"
            if iter_id != len(all_results) - 1
            else "best_clipscore.json"
        )
        with open(os.path.join(save_dir, name), "w") as f:
            json.dump(all_results[iter_id], f)
    return save_dir


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    add_reference_args(parser)
    parser.add_argument("--prefetch_workers", type=int, default=1,
                        help="host decode/preprocess threads feeding the "
                             "device loop (HOST_FEED.json: 1 worker "
                             "sustains ~90 images/s on a 1-core host — "
                             "~1 chip at the fast tiers; raise on "
                             "multi-core production hosts)")
    parser.add_argument("--random_models", nargs="?", const="full",
                        choices=["full", "tiny"], default=False,
                        help="deterministic random-init models instead of "
                             "checkpoints; 'tiny' uses small test towers")
    parser.set_defaults(batch_size=2, caption_img_path="./examples/")
    args = parser.parse_args(argv)
    cfg = config_from_args(args)  # --device cpu handled there (functional)
    rng = set_seed(cfg.seed)

    run_type = run_type_label(cfg)
    logger = create_logger(cfg.logger_dir, run_log_filename(cfg))
    logger.info(f"Generating order:{cfg.order}")
    logger.info(f"Run type:{run_type}")
    logger.info(args)

    if not os.path.isdir(cfg.caption_img_path):
        import sys

        sys.exit(f"image directory not found: {cfg.caption_img_path!r}")

    from conzic_tpu.api.demo import build_mesh

    captioner = build_captioner(
        cfg, random_models=args.random_models, mesh=build_mesh(cfg)
    )

    from conzic_tpu.runtime.image import preprocess_batch_pil
    from conzic_tpu.runtime.prefetch import prefetch_map

    image_size = captioner.clip_model.config.vision.image_size

    from conzic_tpu.runtime.profiling import annotate

    def host_pipeline(batch):
        # decode+resize+normalize on the prefetch thread: overlaps the
        # previous batch's device generation (runtime/prefetch.py);
        # annotated so a CONZIC_TRACE_DIR capture shows the host stage
        # riding alongside the device timeline
        imgs, names = batch
        with annotate("host:preprocess"):
            return preprocess_batch_pil(imgs, image_size), names

    for sample_id in range(cfg.samples_num):
        all_results = [None] * (cfg.num_iterations + 1)
        logger.info(f"Sample {sample_id + 1}: ")
        for batch_idx, (pixels, names) in enumerate(prefetch_map(
            host_pipeline,
            iter_image_batches(cfg.caption_img_path, cfg.batch_size, logger),
            workers=args.prefetch_workers,
        )):
            logger.info(f"The {batch_idx + 1}-th batch:")
            image_embeds = captioner.encode_images(pixels)
            if cfg.run_type == "caption":
                gen_texts, _ = generate_caption(
                    names, captioner, image_embeds, logger,
                    prompt=cfg.prompt, batch_size=cfg.batch_size,
                    max_len=cfg.sentence_len, top_k=cfg.candidate_k,
                    temperature=cfg.lm_temperature,
                    max_iter=cfg.num_iterations,
                    alpha=cfg.alpha, beta=cfg.beta,
                    generate_order=cfg.order, rng=rng,
                )
            else:
                gen_texts, _ = control_generate_caption(
                    names, captioner, image_embeds, logger,
                    prompt=cfg.prompt, batch_size=cfg.batch_size,
                    max_len=cfg.sentence_len, top_k=cfg.candidate_k,
                    temperature=cfg.lm_temperature,
                    max_iter=cfg.num_iterations,
                    alpha=cfg.alpha, beta=cfg.beta, gamma=cfg.gamma,
                    ctl_type=cfg.control_type, style_type=cfg.sentiment_type,
                    pos_type=cfg.pos_type, generate_order=cfg.order, rng=rng,
                )
            all_results = accumulate(all_results, names, gen_texts)
        save_dir = save_results(cfg, run_type, all_results, sample_id)
        logger.info(f"saved results to {save_dir}")


if __name__ == "__main__":
    main()
