from tacotron_tpu.data.vocab import Vocab
from tacotron_tpu.data.buckets import BucketSpec, make_buckets, assign_bucket
from tacotron_tpu.data.loader import DataLoader, Batch
from tacotron_tpu.data import ljspeech

__all__ = [
    "Vocab",
    "BucketSpec",
    "make_buckets",
    "assign_bucket",
    "DataLoader",
    "Batch",
    "ljspeech",
]
