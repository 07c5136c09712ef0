"""TPU-native rebuild of NeuSpeech (brain signal -> text via Whisper-style
encoder-decoder), built on JAX/XLA/pjit/Pallas.

Reference capabilities: NeuSpeech/NeuSpeech1 (arXiv:2403.01748); see SURVEY.md.
"""

__version__ = "0.1.0"


def enable_compilation_cache(path: str = "/root/.cache/jax_comp_cache") -> None:
    """Persistent XLA compilation cache — first compiles through the remote
    TPU compile tunnel take minutes; cached reloads take seconds. Called by
    the CLIs; safe to call multiple times."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
