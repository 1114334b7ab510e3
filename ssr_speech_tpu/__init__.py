"""SSR-Speech TPU: a TPU-native (JAX/XLA/Pallas) zero-shot speech editing and
TTS framework with the capabilities of WangHelin1997/SSR-Speech."""

__version__ = "0.1.0"
