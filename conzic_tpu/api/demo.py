"""Single-image captioning CLI — reference ``demo.py`` equivalent.

Same flags and defaults (``/root/reference/demo.py:15-76``), same flow
(``:105-152``): seed, logger with config-encoded filename, model load, token
mask, then ``samples_num`` independent generations over one image.

Model loading: ``--lm_model`` / ``--match_model`` accept local HF checkpoint
directories (config.json + safetensors/bin + tokenizer files). With
``--random_models`` the pipeline runs on deterministic randomly initialized
full-architecture models (no network in this environment).
"""

from __future__ import annotations

import argparse
import os
import sys

from conzic_tpu.config import add_reference_args, config_from_args
from conzic_tpu.engine.sampler import (
    Captioner,
    control_generate_caption,
    generate_caption,
)
from conzic_tpu.runtime.logging import create_logger, run_log_filename
from conzic_tpu.runtime.seeding import set_seed


def build_mesh(cfg):
    """1-D data mesh over ``--mesh_data_axis`` devices (the production
    scale-out layout: captions are embarrassingly parallel over
    images x samples, SURVEY.md §2.3). 1 = single device (no mesh);
    0/negative = all visible devices."""
    if cfg.mesh_data_axis == 1:
        return None
    from conzic_tpu.parallel import mesh as mesh_lib

    n = cfg.mesh_data_axis if cfg.mesh_data_axis > 0 else None
    return mesh_lib.make_mesh(n)


def build_captioner(cfg, random_models=False, mesh=None) -> Captioner:
    if random_models:
        from conzic_tpu.models.configs import BertConfig, CLIPConfig
        from conzic_tpu.text.vocab import make_fullsize_wordpiece_vocab

        if random_models == "tiny":  # fast smoke runs / CI drives
            return Captioner.from_random(cfg, seed=cfg.seed, mesh=mesh)
        return Captioner.from_random(
            cfg,
            bert_config=BertConfig(),
            clip_config=CLIPConfig(),
            wp_vocab=make_fullsize_wordpiece_vocab(),
            clip_text_vocab_size=49408,
            seed=cfg.seed,
            mesh=mesh,
        )
    for path in (cfg.lm_model, cfg.match_model):
        if not os.path.isdir(path):
            sys.exit(
                f"checkpoint directory not found: {path!r}\n"
                "Pass local HF checkpoint dirs via --lm_model/--match_model "
                "or use --random_models for a no-checkpoint smoke run."
            )
    return Captioner.from_pretrained(cfg, mesh=mesh)


def run_caption(cfg, image_path, captioner, logger, rng, fuse_samples=True):
    from PIL import Image

    logger.info(f"Processing: {image_path}")
    image_instance = Image.open(image_path).convert("RGB")
    img_name = [image_path.split("/")[-1]] * cfg.batch_size
    image_embeds = captioner.encode_images([image_instance] * cfg.batch_size)
    if fuse_samples and cfg.samples_num > 1:
        # all samples as fused batch lanes of ONE compiled program —
        # byte-identical results to the sequential loop (test-pinned)
        result = captioner.run(
            image_embeds, prompt=cfg.prompt, max_len=cfg.sentence_len,
            top_k=cfg.candidate_k, temperature=cfg.lm_temperature,
            max_iter=cfg.num_iterations, alpha=cfg.alpha, beta=cfg.beta,
            order=cfg.order, rng=rng, n_samples=cfg.samples_num,
        )
        for sample_id, res in enumerate(
            captioner.split_samples(result, cfg.samples_num)
        ):
            logger.info(f"Sample {sample_id}: ")
            if captioner.cfg.verbose:
                captioner.log_iterations(logger, img_name, res)
            logger.info(
                "Finished in %.3fs (fused over %d samples)"
                % (result.elapsed_s, cfg.samples_num)
            )
            for i in range(cfg.batch_size):
                logger.info(f"The {i + 1}-th image: {img_name[i]}")
                logger.info(f"final caption: {res.gen_texts_list[-2][i]}")
                logger.info(f"best caption: {res.gen_texts_list[-1][i]}")
        return
    for sample_id in range(cfg.samples_num):
        logger.info(f"Sample {sample_id}: ")
        generate_caption(
            img_name, captioner, image_embeds, logger,
            prompt=cfg.prompt, batch_size=cfg.batch_size,
            max_len=cfg.sentence_len, top_k=cfg.candidate_k,
            temperature=cfg.lm_temperature, max_iter=cfg.num_iterations,
            alpha=cfg.alpha, beta=cfg.beta, generate_order=cfg.order, rng=rng,
        )


def run_control(cfg, image_path, captioner, logger, rng):
    from PIL import Image

    logger.info(f"Processing: {image_path}")
    image_instance = Image.open(image_path).convert("RGB")
    img_name = [image_path.split("/")[-1]] * cfg.batch_size
    image_embeds = captioner.encode_images([image_instance] * cfg.batch_size)
    for sample_id in range(cfg.samples_num):
        logger.info(f"Sample {sample_id}: ")
        control_generate_caption(
            img_name, captioner, image_embeds, logger,
            prompt=cfg.prompt, batch_size=cfg.batch_size,
            max_len=cfg.sentence_len, top_k=cfg.candidate_k,
            temperature=cfg.lm_temperature, max_iter=cfg.num_iterations,
            alpha=cfg.alpha, beta=cfg.beta, gamma=cfg.gamma,
            ctl_type=cfg.control_type, style_type=cfg.sentiment_type,
            pos_type=cfg.pos_type, generate_order=cfg.order, rng=rng,
        )


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    add_reference_args(parser)
    parser.add_argument("--random_models", nargs="?", const="full",
                        choices=["full", "tiny"], default=False,
                        help="deterministic random-init models instead of "
                             "checkpoints; 'tiny' uses small test towers")
    parser.add_argument("--no_fuse_samples", action="store_true",
                        help="run samples as a sequential loop instead of "
                             "fused batch lanes (same results either way)")
    args = parser.parse_args(argv)
    cfg = config_from_args(args)  # --device cpu handled there (functional)
    rng = set_seed(cfg.seed)

    logger = create_logger(
        cfg.logger_dir, "demo_" + run_log_filename(cfg)
    )
    logger.info(f"Generating order:{cfg.order}")
    logger.info(f"Run type:{cfg.run_type}")
    logger.info(args)

    # validate before the (expensive) model build
    if not os.path.exists(cfg.caption_img_path):
        sys.exit(f"image not found: {cfg.caption_img_path!r}")

    captioner = build_captioner(
        cfg, random_models=args.random_models, mesh=build_mesh(cfg)
    )
    if cfg.run_type == "caption":
        run_caption(cfg, cfg.caption_img_path, captioner, logger, rng,
                    fuse_samples=not args.no_fuse_samples)
    elif cfg.run_type == "controllable":
        run_control(cfg, cfg.caption_img_path, captioner, logger, rng)
    else:
        raise Exception("run_type must be caption or controllable!")


if __name__ == "__main__":
    main()
