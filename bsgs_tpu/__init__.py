"""bsgs_tpu — a TPU-native baby-step/giant-step secp256k1 discrete-log solver.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the CUDA
reference implementation Etayson/BSGS-cuda (see SURVEY.md):

- ``ops``      — 256-bit field and elliptic-curve arithmetic as 16x16-bit limb
                 planes in uint32, vectorized across TPU lanes, plus Pallas
                 kernels for the hot paths.
- ``models``   — the solver itself: baby-table construction, CSR-packed hash
                 table probing, epoch-scan giant stepping, host-side candidate
                 verification.
- ``parallel`` — device-mesh sharding: key-range striping across chips and
                 sharded-table probe routing via collectives.
- ``utils``    — host-side pure-Python secp256k1 oracle, codecs, artifacts,
                 checkpointing, auto-tuner.
"""

__version__ = "0.1.0"
