"""PoreOver-TPU: TPU-native nanopore consensus-decoding framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of jordisr/poreover
(reference layout: poreover/__main__.py, poreover/decoding/*, poreover/network/*):

- ``call``        : neural-network basecalling forward pass (flax conv+BiGRU CTC)
- ``decode``      : 1D decoding (Viterbi / vectorized beam search / prefix search)
- ``pair-decode`` : 1D^2 pair consensus decoding over a banded alignment envelope
- ``train``       : CTC training with checkpointing
- ``benchmark``   : accuracy evaluation of basecalls against a reference genome

Unlike the reference (per-read CPU multiprocessing + C++/Cython kernels), all
dynamic-programming inner loops here are fixed-shape JAX scans / Pallas kernels
that run batched on TPU, and reads are sharded across a ``jax.sharding.Mesh``.
"""

__version__ = "0.1.0"

from . import utils  # noqa: F401
