"""Inference: the audio-driven portrait animation pipeline + video IO."""

from emox.infer.pipeline import EMOPipeline
from emox.infer.video_io import save_video, frames_to_uint8

__all__ = ["EMOPipeline", "save_video", "frames_to_uint8"]
