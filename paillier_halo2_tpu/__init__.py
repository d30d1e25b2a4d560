"""paillier_halo2_tpu — TPU-native Paillier-in-Halo2 framework.

From-scratch JAX/XLA/Pallas re-design of aerius-labs/paillier-halo2 and its
dependency stack (see SURVEY.md). Layer map:

- ff/       BN254 Fr/Fq digit-vector arithmetic (device) + host oracles
- bignum/   limb decompose/recompose + witness big-uint math
- gadgets/  constraint synthesis: Context, GateChip, RangeChip, BigUintChip,
            PaillierChip (the reference's layers 1-3)
- mock/     vectorized MockProver (constraint checker)
- poly/     NTT/iNTT + evaluation domains over Fr
- ec/       BN254 G1/G2 point arithmetic (device batched + host) and pairing
- msm/      Pippenger multi-scalar multiplication
- plonk/    PLONKish proving system: keygen, prover, verifier, KZG, transcript
- mesh/     multi-chip sharding (shard_map over jax.sharding.Mesh)
- harness/  base_test()-style test/bench builder + phase timers
"""

__version__ = "0.1.0"
