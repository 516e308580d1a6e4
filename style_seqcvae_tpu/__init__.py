"""style_seqcvae_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of visinf/style-seqcvae ("Diverse Image Captioning with Grounded
Style", GCPR 2021).

The framework is a ground-up redesign, not a port:

* The three-stage pipeline (Faster R-CNN bottom-up features + attributes →
  Style-SeqCVAE captioner → constrained-beam-search decoding/eval) is kept at
  the artifact level (same ``features.h5`` schema, same predictions-JSON
  schema) so results are comparable with the reference.
* All compute paths are functional JAX compiled by XLA; per-token Python loops
  in the reference become single ``jax.lax.scan`` programs; the CBS decode grid
  (batch × z-samples × FSM-states × beam) is vectorized on device.
* Distribution uses ``jax.sharding.Mesh`` + NamedSharding (data parallel over
  ICI, FSDP-style parameter sharding available on the model axis) instead of
  ``torch.nn.DataParallel``.

Reference layout citations in docstrings use ``path:line`` into the reference
repository (e.g. ``var_updown/var_updown/modules/updown_cell.py:47``).
"""

__version__ = "0.1.0"
