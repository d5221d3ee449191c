"""conzic_tpu — TPU-native zero-shot controllable image captioning.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of ConZIC
(joeyz0z/ConZIC, CVPR 2023, arXiv 2303.02437): sampling-based caption
polishing that composes a frozen BERT masked-LM (fluency proposal), a frozen
CLIP (image-matching energy) and optional sentiment / part-of-speech control
energies — no training, inference only.

Architecture (TPU-first, not a port):
  - ``models/``    Flax BERT-MLM + CLIP towers, HF-checkpoint converters,
                   Pallas attention kernels.
  - ``text/``      WordPiece + CLIP-BPE tokenizers, vocabulary constraint
                   mask, BERT-id -> CLIP-id bridge for on-device candidate
                   scoring.
  - ``engine/``    the Gibbs polishing loop as one jit-compiled
                   ``lax.scan`` program (orders are permutation *data*).
  - ``energies/``  fused pure scoring functions (LM, CLIP, sentiment, POS,
                   repeat penalty).
  - ``parallel/``  ``jax.sharding.Mesh`` scale-out of (images x samples).
  - ``api/``       CLI / web entry points with reference flag parity.
  - ``eval/``      CLIPScore, Div-n, POS-accuracy metrics.
"""

from conzic_tpu.version import __version__

__all__ = ["__version__"]
