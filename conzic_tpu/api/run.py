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


def iter_image_batches(dir_path: str, batch_size: int, logger,
                       row_slice=None, image_size=None):
    """Yields (pil_images, names) of exactly batch_size (drop_last=True).

    ``row_slice`` (multi-host per-process feeding): every process builds
    the SAME global batch membership from the sorted directory listing,
    but only DECODES its contiguous block of rows — ``pil_images`` holds
    that block while ``names`` stays the full global batch. Batch
    membership must be identical across processes, so unreadable images
    cannot be skipped there: they decode to a black placeholder
    (``image_size`` square) and are logged instead."""
    from PIL import Image

    names = sorted(os.listdir(dir_path))  # deterministic batching
    if row_slice is None:
        # single-process: the reference's skip-on-error handling
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
        return
    batch_names = []
    for name in names:
        batch_names.append(name)
        if len(batch_names) == batch_size:
            imgs = []
            for n in batch_names[row_slice]:
                try:
                    imgs.append(
                        Image.open(os.path.join(dir_path, n)).convert("RGB"))
                except Exception as e:
                    # multi-host membership is global: substitute, don't skip
                    logger.info(f"unreadable image {n}: {e} — black "
                                f"placeholder keeps the global batch aligned")
                    side = image_size or 224
                    imgs.append(Image.new("RGB", (side, side)))
            yield imgs, batch_names
            batch_names = []


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
    parser.add_argument("--multihost", action="store_true",
                        help="multi-host scale-out: every process of the "
                             "job runs this CLI; jax.distributed is "
                             "initialized, the mesh spans GLOBAL devices "
                             "(--mesh_data_axis 0 = all), each process "
                             "decodes its contiguous slice of every "
                             "global batch, and process 0 writes the "
                             "artifacts (CONZIC_MULTIHOST=1 also opts in)")
    parser.add_argument("--coordinator_address", default=None,
                        help="host:port of process 0 (omit on cluster "
                             "environments JAX auto-detects)")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    parser.set_defaults(batch_size=2, caption_img_path="./examples/")
    args = parser.parse_args(argv)
    cfg = config_from_args(args)  # --device cpu handled there (functional)

    from conzic_tpu.parallel import distributed

    multihost = args.multihost or distributed.env_requested()
    if multihost:
        # before any backend-initializing JAX call (config_from_args only
        # sets jax.config flags)
        distributed.initialize(args.coordinator_address,
                               args.num_processes, args.process_id)
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

    if multihost and cfg.mesh_data_axis == 1:
        # multi-host without a mesh cannot express the global batch;
        # default to all global devices rather than silently running
        # N disconnected single-device copies
        cfg.mesh_data_axis = 0
    captioner = build_captioner(
        cfg, random_models=args.random_models, mesh=build_mesh(cfg)
    )
    row_slice = None
    if multihost:
        if cfg.batch_size % distributed.process_count():
            import sys

            sys.exit(f"--batch_size {cfg.batch_size} must be a multiple "
                     f"of the process count "
                     f"({distributed.process_count()}) for per-process "
                     f"feeding")
        row_slice = distributed.local_slice(cfg.batch_size)

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
            iter_image_batches(cfg.caption_img_path, cfg.batch_size, logger,
                               row_slice=row_slice, image_size=image_size),
            workers=args.prefetch_workers,
        )):
            logger.info(f"The {batch_idx + 1}-th batch:")
            image_embeds = captioner.encode_images(
                pixels, local=row_slice is not None)
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
        if distributed.is_primary():
            # every process holds the FULL results (gather_to_host in
            # the engine); exactly one writes the artifact tree
            save_dir = save_results(cfg, run_type, all_results, sample_id)
            logger.info(f"saved results to {save_dir}")


if __name__ == "__main__":
    main()
