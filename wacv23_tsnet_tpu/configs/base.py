"""Experiment configuration for TS-Net TPU.

Replaces the reference's module-level UPPER_CASE constants + argparse mix
(reference train_face.py:22-54, train_pose.py:22-57, demo/demo_face.py:25-59)
with frozen dataclasses. All knobs of the reference are preserved.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class TSNetConfig:
    """Architecture + loss configuration of one TS-Net model.

    Shapes follow reference model/TSNet.py:203-228 (see SURVEY.md §2.4).
    """

    # task: "face" (label_nc=2) or "pose" (label_nc=25)
    task: str = "face"
    label_nc: int = 2
    image_size: int = 256
    n_source: int = 3

    # trunk widths / depths (reference train_face.py:22,35; TSNet.py:218-227)
    ngf: int = 64
    n_downsampling: int = 3
    enc_n_blocks: int = 9      # img_enc resblocks (Encoder default, TSNet.py:53)
    dec_n_blocks: int = 4      # N_BLOCKS in the drivers (train_face.py:22)
    addcoords: bool = True     # CoordConv channels on both encoders

    # transformation branch
    softmax_temp: float = 100.0  # hard-coded in reference (TSNet.py:359)

    # pose-variant switches (reference model/TSNet_pose.py)
    use_face_d: bool = False       # extra face-crop discriminator netDF
    use_fg_mask: bool = False      # fixed foreground mask cols 64:192 compositing
    use_align_loss: bool = True    # cosine align loss (face only)

    # loss weights (train_face.py:41-44; warp loss has intrinsic x10)
    lambda_fml: float = 10.0
    lambda_vgg: float = 10.0
    lambda_grad: float = 10.0
    lambda_con: float = 10.0   # accepted-but-unused in the reference too (TSNet.py:249)

    # discriminator
    ndf: int = 64
    d_n_layers: int = 3

    # numerics
    compute_dtype: str = "float32"   # "bfloat16" for the fast path
    # conv/matmul MXU precision for fp32 activations: "highest" (6-pass,
    # bit-parity with torch), "high" (3-pass), "default" (1 bf16 pass).
    # The similarity branch always runs fp32-highest regardless.
    precision: str = "highest"
    # fast tail: run fuse_net + decoder in bfloat16. Their outputs never
    # feed the temp-100 attention (only the encoders do), so tail
    # precision trades a small output drift for the bulk of the FLOPs.
    fast_tail: bool = False
    # fast trunk (inference tier): the two ENCODERS' convs run at
    # "default" MXU precision (one bf16 pass) instead of `precision`;
    # activations stay f32 and the similarity logits/softmax/flow keep
    # their fp32 path, so the temp-100 attention sees bf16-rounded
    # FEATURES but full-precision MATH. The reference's hot path is
    # these trunks (model/TSNet.py:309-407). Training REJECTS this tier:
    # the gradient cosine through the attention collapses (0.088,
    # artifacts/round4/bf16_trunk_cos_cpu.py); the drift/fps measurement
    # that gates the inference adoption lives in artifacts/round5/.
    fast_trunk: bool = False
    # ring-pad convs: compute every reflect-padded conv as a zero-pad
    # conv + thin border-band correction convs instead of materializing
    # the reflect-padded activation (ops/reflectconv.py; same sums,
    # interiors bit-identical). Measured and REJECTED as default on the
    # real chip: placing the borders costs more than the pad it removes
    # (457 -> 512 ms/step, 719 -> 645 fps;
    # artifacts/round5/ring_pad_ab.json). Kept as the documented
    # measured rejection of the trace's 37.5 ms reflect_pad line
    # (artifacts/round5/train_trace.py).
    ring_pad: bool = False
    # MXU precision of the BACKWARD convs only (None = same as forward).
    # The backward pass of every conv is two more convs (input-cotangent
    # + filter-gradient); those feed Adam, not the precision-sensitive
    # temp-100 attention, so they tolerate "default" (one bf16 pass)
    # while the forward stays at `precision`. See ops/dpconv.py.
    bwd_precision: Optional[str] = None
    # rematerialize subnet activations in the backward pass (jax
    # checkpoint): ~30% more forward FLOPs for a large cut in training
    # HBM, enabling bigger batches/resolutions on one chip.
    remat: bool = False
    # BGR channel means in [0,255]; images cross the data boundary
    # mean-subtracted (dataset_video_face.py:136-139) and are divided by 255
    # on model ingest (TSNet.py:268,279).
    img_mean: Tuple[float, float, float] = (
        101.84807705937696, 112.10832843463207, 111.65973036298041,
    )

    @property
    def feat_ch(self) -> int:
        """Channel width of the encoder output (512 at the shipped config)."""
        return self.ngf * (2 ** self.n_downsampling)

    @property
    def feat_size(self) -> int:
        """Spatial side of the encoder output (32 at the shipped config)."""
        return self.image_size // (2 ** self.n_downsampling)

    def img_mean_array(self) -> np.ndarray:
        return np.asarray(self.img_mean, dtype=np.float32)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization schedule, mirroring reference knobs.

    Poly LR decay per step after INITIAL_ITER examples
    (reference model/TSNet.py:504-512,523-524; train_face.py:26-27,39).
    """

    batch_size: int = 15
    lr: float = 2e-4
    beta1: float = 0.5
    beta2: float = 0.999
    lambda_dec: float = 1.0     # decoder LR multiplier (TSNet.py:236)
    d_lr_factor: float = 0.5    # discriminator LR = 0.5 * lr (TSNet.py:238)
    power: float = 1.0
    initial_epoch: int = 400
    max_epoch: int = 900
    n_frame_total: int = 10
    n_source: int = 3           # first N_SOURCE frames of each clip
    num_videos: int = 150       # 100 for pose (train_pose.py:30)
    frame_interval: int = 1     # 4 for pose
    seed: int = 1234
    print_freq: int = 100
    save_img_freq: int = 100
    snapshot_dir: str = "snapshots"
    imgshot_dir: str = "imgshots"

    @property
    def num_examples_per_epoch(self) -> int:
        return self.num_videos * (self.n_frame_total - self.n_source)

    @property
    def initial_iter(self) -> int:
        return self.num_examples_per_epoch * self.initial_epoch

    @property
    def max_iter(self) -> int:
        import math
        steps_per_epoch = math.ceil(self.num_examples_per_epoch / float(self.batch_size))
        return max(self.num_examples_per_epoch * self.max_epoch + 1,
                   steps_per_epoch * self.batch_size * self.max_epoch + 1)


def face_config() -> TSNetConfig:
    """The shipped FaceForensics config (reference train_face.py:22-44)."""
    return TSNetConfig(task="face", label_nc=2, use_align_loss=True)


def pose_config() -> TSNetConfig:
    """The shipped Youtube-dance config (reference train_pose.py:22-47,
    model/TSNet_pose.py:206-280): 25 label classes, extra face-crop
    discriminator, fixed foreground-mask compositing, no align loss."""
    return TSNetConfig(
        task="pose",
        label_nc=25,
        use_face_d=True,
        use_fg_mask=True,
        use_align_loss=False,
    )


def toy_config() -> TSNetConfig:
    """Tiny config for fast unit tests (64x64, thin trunk)."""
    return TSNetConfig(
        task="face",
        label_nc=2,
        image_size=64,
        ngf=8,
        n_downsampling=2,
        enc_n_blocks=2,
        dec_n_blocks=1,
        n_source=2,
    )


def toy_pose_config() -> TSNetConfig:
    """Tiny POSE config for fast unit tests: same thin trunk as
    `toy_config` but with the pose variant's switches on — face-crop
    discriminator netDF (reference model/TSNet_pose.py:509-542), the
    data-dependent `crop_faces` gather (:438-482), fixed fg-mask
    compositing (:276-280), no align loss. label_nc=8 is the smallest
    width that exercises the head channels 1..4 and the face channel -1
    read by `get_face_bbox`. d_n_layers=2: at the toy 64^2 size the face
    crops are 16^2, where a 3-layer PatchGAN's deep maps degenerate to
    zero-variance instance norms (NaN) — same choice as
    tests/test_pose_variant.py."""
    return TSNetConfig(
        task="pose",
        label_nc=8,
        d_n_layers=2,
        image_size=64,
        ngf=8,
        n_downsampling=2,
        enc_n_blocks=2,
        dec_n_blocks=1,
        n_source=2,
        use_face_d=True,
        use_fg_mask=True,
        use_align_loss=False,
    )
