"""Host-side data pipeline: synthetic fixtures, face/pose utilities, offline
precompute, and the stage-keyed dataset + loader.

Design stance (SURVEY.md §7): ALL CV/audio preprocessing happens offline into
cached arrays — the TPU never waits on Python CV code (the reference ran
MediaPipe + PnP per __getitem__ and even pinned CUDA inside dataloader
workers, reference Net.py:1189-1445,1201)."""

from emox.data.fixtures import make_synthetic_clip, write_fixture_dataset
from emox.data.face import FaceHelper, head_pose_from_landmarks, pose_velocities
from emox.data.dataset import EMODataset, DataLoader
from emox.data.precompute import precompute_clip, precompute_dataset

__all__ = [
    "make_synthetic_clip",
    "write_fixture_dataset",
    "FaceHelper",
    "head_pose_from_landmarks",
    "pose_velocities",
    "EMODataset",
    "DataLoader",
    "precompute_clip",
    "precompute_dataset",
]
