#!/usr/bin/env python
"""Host input fan-out ceiling (VERDICT r3 weak #4).

BASELINE.md's multi-chip projection is "N x single-chip up to host-side
input fan-out" — this measures the fan-out term: the sustained rate at
which ONE host can feed chips through the EXACT production input path
(api/run.py): JPEG decode -> exact-HF bicubic resize + normalize
(runtime/image.preprocess_batch_pil) -> one-ahead prefetch thread
(runtime/prefetch.prefetch_map) -> consumer. The device step is a no-op
stub, so the number is pure host pipeline throughput.

Derives max chips/host per published tier: a v5e-8 running the pruned
ladder at C caps/s/chip needs 8*C images/s of input (each caption
consumes one image per sample pass; samples re-use embeddings, so this
is the WORST case: samples_num=1).

Writes HOST_FEED.json. Reference analog: /root/reference/run.py:156-178
(inline PIL loads on the generation thread, no overlap).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_image_dir(n: int, w: int, h: int, quality: int, seed: int) -> str:
    """n synthetic JPEGs with photo-like spectra (smooth gradients +
    noise — compresses like a natural image, not like white noise)."""
    from PIL import Image

    d = tempfile.mkdtemp(prefix="host_feed_")
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    for i in range(n):
        fx, fy = rng.uniform(1, 6, 2)
        base = (
            127 + 80 * np.sin(2 * np.pi * fx * xx / w + rng.uniform(0, 6))
            * np.cos(2 * np.pi * fy * yy / h + rng.uniform(0, 6))
        )
        img = np.stack([base + rng.randn(h, w) * 12 for _ in range(3)], -1)
        img = np.clip(img, 0, 255).astype(np.uint8)
        Image.fromarray(img).save(
            os.path.join(d, f"img_{i:05d}.jpg"), quality=quality)
    return d


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_images", type=int, default=512)
    p.add_argument("--batch_size", type=int, default=128,
                   help="the pruned tiers' production batch shape")
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--quality", type=int, default=90)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--workers", type=int, default=1,
                   help="prefetch_map decode threads (the multi-core "
                        "scaling lever; 1 = the production default)")
    p.add_argument("--repeats", type=int, default=3,
                   help="passes over the directory (first pass warms the "
                        "page cache; the ceiling quotes the later passes)")
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "HOST_FEED.json"))
    args = p.parse_args()

    from conzic_tpu.api.run import iter_image_batches
    from conzic_tpu.runtime.image import preprocess_batch_pil
    from conzic_tpu.runtime.prefetch import prefetch_map

    logger = logging.getLogger("host_feed")
    logger.addHandler(logging.NullHandler())

    d = make_image_dir(args.n_images, args.width, args.height,
                       args.quality, seed=0)
    try:
        def host_pipeline(batch):  # api/run.py's exact host stage
            imgs, names = batch
            return preprocess_batch_pil(imgs, args.image_size), names

        per_pass = []
        for r in range(args.repeats):
            t0 = time.time()
            n_done = 0
            for pixels, names in prefetch_map(
                host_pipeline,
                iter_image_batches(d, args.batch_size, logger),
                workers=args.workers,
            ):
                # no-op device step: touch the buffer like encode_images
                # would (materialized array, correct shape/dtype)
                assert pixels.shape[1:] == (
                    args.image_size, args.image_size, 3)
                n_done += pixels.shape[0]
            per_pass.append(n_done / (time.time() - t0))
        warm = per_pass[1:] if len(per_pass) > 1 else per_pass
        ceiling = float(np.median(warm))

        # chips one host can feed, per published tier — read from
        # LADDER.json (the single committed source bench.py also
        # resolves) so a ladder re-measure can't desynchronize this
        # derivation; full parity is appended from BASELINE.md's
        # headline (not a ladder point)
        tiers = {"full parity (3.25)": 3.25}
        ladder_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "LADDER.json")
        try:
            with open(ladder_path) as f:
                for pt in json.load(f).get("points", []):
                    tiers[f"{pt['name']} ({pt['caps_per_s']} caps/s/chip, "
                          f"session {pt.get('session')})"] = pt["caps_per_s"]
        except (OSError, ValueError, KeyError) as e:
            print(f"NOTE: LADDER.json unavailable ({e}); "
                  "per-tier chips/host omitted", file=sys.stderr)
        doc = {
            "images_per_sec_host_pipeline": round(ceiling, 2),
            "per_pass": [round(v, 2) for v in per_pass],
            "config": {
                "n_images": args.n_images, "batch_size": args.batch_size,
                "jpeg": f"{args.width}x{args.height}@q{args.quality}",
                "image_size": args.image_size,
                "prefetch_depth": 1,
                "workers": args.workers,
                "host": f"nproc={os.cpu_count()}",
            },
            "max_chips_per_host": {
                name: (round(ceiling / cps, 1) if cps else None)
                for name, cps in tiers.items()
            },
            "note": ("worst case samples_num=1 (every caption consumes a "
                     "fresh image); multi-sample runs divide the input "
                     "requirement by samples_num. The pipeline is one "
                     "thread + one prefetch thread; more decode workers "
                     "would raise the ceiling on multi-core hosts."),
        }
        with open(args.out, "w") as f:
            json.dump(doc, f, indent=1)
        print(json.dumps(doc, indent=1))
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
