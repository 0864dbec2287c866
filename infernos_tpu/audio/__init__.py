from .chunk import AudioChunk, VadAudioChunk
from .markers import ASMarkerGeneric, ASMarkerNewSent, ASMarkerSentDoneCB

__all__ = [
    "AudioChunk",
    "VadAudioChunk",
    "ASMarkerGeneric",
    "ASMarkerNewSent",
    "ASMarkerSentDoneCB",
]
