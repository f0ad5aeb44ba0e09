"""TPU-native speech emotion recognition framework.

Built from scratch for JAX/XLA/Pallas on TPU with the same capabilities and
public API shape as the reference ``ser`` package (see SURVEY.md): profile-based
emotion inference over audio, Whisper transcription, merged timelines, and a
full training stack — with the compute path designed for the MXU and device
meshes rather than ported from torch.
"""

from ser_tpu.domain import DatasetConsents, EmotionSegment, TimelineEntry, TranscriptWord

__version__ = "0.1.0"

__all__ = [
    "DatasetConsents",
    "EmotionSegment",
    "TimelineEntry",
    "TranscriptWord",
    "__version__",
]
