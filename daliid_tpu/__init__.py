"""daliid_tpu — a TPU-native (JAX/XLA/Pallas/pjit) person re-identification framework.

Re-implements the capabilities of the DaliID reference (distortion-adaptive
person re-ID: turbulence-paired training, cosine-scheduled weighted losses,
EMA momentum encoders, cosine-distance CMC/mAP evaluation, and clean+distorted
magnitude-weighted fusion) as an idiomatic functional JAX framework:

- pure jit-compiled ``train_step`` / ``extract_features`` over a device mesh,
- explicit PRNG keys everywhere (no hidden RNG state),
- static shapes + masking instead of ragged batches,
- on-device vectorized CMC/mAP ranking instead of a host Cython scan,
- batch-axis sharding over ICI via ``jax.sharding`` instead of DataParallel.

Reference repo: Gabrielcb/DaliID (``Person-ReID/``), cited throughout as
``file:line``.
"""

__version__ = "0.1.0"
