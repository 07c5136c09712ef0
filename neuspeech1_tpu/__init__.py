"""TPU-native rebuild of NeuSpeech (brain signal -> text via Whisper-style
encoder-decoder), built on JAX/XLA/pjit/Pallas.

Reference capabilities: NeuSpeech/NeuSpeech1 (arXiv:2403.01748); see SURVEY.md.
"""

__version__ = "0.1.0"
