from tacotron_tpu.infer.synthesize import Synthesizer

__all__ = ["Synthesizer"]
