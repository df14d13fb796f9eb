from . import text, vectors, waveforms  # noqa: F401
