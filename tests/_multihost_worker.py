"""Worker for tests/test_multihost.py: one process of a 2-process CPU
jax.distributed run. Builds the tiny random captioner over the GLOBAL
8-device mesh (4 local CPU devices x 2 processes), feeds its local block
of a deterministic global pixel batch, runs one generation, and process
0 writes the decoded results as JSON for the parent test to compare
against the single-process reference."""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    port, pid, out = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)

    from conzic_tpu.parallel import distributed

    distributed.initialize(f"localhost:{port}", num_processes=2,
                           process_id=pid)
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8

    from conzic_tpu.config import ConzicConfig
    from conzic_tpu.engine.sampler import Captioner
    from conzic_tpu.parallel import mesh as mesh_lib

    cfg = ConzicConfig()
    cfg.verbose = False
    cfg.dtype = "float32"
    cfg.param_dtype = "float32"
    mesh = mesh_lib.make_mesh()  # all 8 GLOBAL devices
    cap = Captioner.from_random(cfg, init_mode="proper", seed=7, mesh=mesh)

    B = 8
    side = cap.clip_model.config.vision.image_size
    pixels = np.random.RandomState(3).rand(B, side, side, 3).astype(
        np.float32)
    local = pixels[distributed.local_slice(B)]
    embeds = cap.encode_images(local, local=True)
    res = cap.run(
        embeds, prompt="Image of a", max_len=4, top_k=8, temperature=0.1,
        max_iter=2, alpha=0.02, beta=2.0, order="sequential",
        rng=np.random.RandomState(5))
    if distributed.is_primary():
        with open(out, "w") as f:
            json.dump({
                "finals": res.gen_texts_list[-2],
                "best": res.gen_texts_list[-1],
                "best_cos": [float(x) for x in res.best_cos],
            }, f)


if __name__ == "__main__":
    main()
