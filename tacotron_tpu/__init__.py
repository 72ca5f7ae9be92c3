"""tacotron_tpu — a TPU-native Tacotron text-to-speech framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
barronalex/Tacotron (TF1, single-GPU): see SURVEY.md for the blueprint.
"""

from tacotron_tpu.config import Config, get_config, PRESETS

__version__ = "0.1.0"
__all__ = ["Config", "get_config", "PRESETS", "__version__"]
