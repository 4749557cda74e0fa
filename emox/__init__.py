"""emox — TPU-native audio-driven portrait-video diffusion framework.

A ground-up JAX / Flax / Pallas / pjit rebuild of the capabilities of
johndpope/Emote-hack (EMO: "Emote Portrait Alive"): given one reference
portrait image and an audio waveform, generate an expressive talking-head
video via latent video diffusion with

  * reference-image attention conditioning (explicit feature pytrees,
    replacing the reference's monkey-patched attention banks,
    cf. reference magicanimate/models/mutual_self_attention.py:128-641),
  * AnimateDiff-style temporal motion modules
    (cf. reference magicanimate/models/motion_module.py:42-334),
  * wav2vec2-style audio cross-attention (cf. reference Net.py:263-325),
  * head-rotation speed-bucket + face-region-mask control
    (cf. reference Net.py:198-258, Net.py:819-855),
  * a three-stage progressive training recipe
    (cf. reference train_stage_{1,2,3}*.py),
  * overlapping-context-window long-video inference
    (cf. reference magicanimate/pipelines/context.py).

Layout convention: images are NHWC, video tensors are [B, T, H, W, C]
(TPU-native), and all attention routes through one dispatcher that picks
the blockwise Pallas flash kernel or XLA's fused attention per call site
from on-chip measurements (emox.ops.attention).
"""

__version__ = "0.1.0"
