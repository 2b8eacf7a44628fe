"""Close the loop through the ACTUAL reference implementation.

Loads a checkpoint exported by `save_reference_checkpoint` into the
reference's own model code (`/root/reference/model/TSNet.py`, imported
live) on torch-CPU, runs its per-frame demo loop
(demo/demo_face.py:149-192 semantics), and returns the reconstructed
frames — so parity tests compare OUR stack against the reference STACK
executing OUR trained weights, not against a reimplemented oracle.

The reference hard-codes CUDA (`model/networks.py:116`,
`model/TSNet.py:266-294`) and imports torchvision for the train-only VGG
loss (`model/TSNet.py:5`); this image has neither a GPU nor torchvision.
For inference the VGG is never constructed (`is_train=False` skips
`model/TSNet.py:231` onward), so a module stub + no-op `.cuda()` patches
let the untouched reference code run on CPU.
"""

from __future__ import annotations

import contextlib
import sys
import types

import numpy as np

REFERENCE_ROOT = "/root/reference"


@contextlib.contextmanager
def _cpu_reference_env():
    """torchvision stub + .cuda() no-ops while importing/running the
    reference modules. Restores everything afterwards."""
    import torch

    added_stub = "torchvision" not in sys.modules
    if added_stub:
        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
    tensor_cuda = torch.Tensor.cuda
    module_cuda = torch.nn.Module.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    path_added = REFERENCE_ROOT not in sys.path
    if path_added:
        sys.path.insert(0, REFERENCE_ROOT)
    try:
        yield
    finally:
        torch.Tensor.cuda = tensor_cuda
        torch.nn.Module.cuda = module_cuda
        if added_stub:
            sys.modules.pop("torchvision", None)
            sys.modules.pop("torchvision.models", None)
        if path_added:
            sys.path.remove(REFERENCE_ROOT)


def load_reference_tsnet(ckpt_path: str, n_source: int = 3,
                         n_blocks: int = 4, n_downsampling: int = 3):
    """Construct the reference TSNet (face) and load a .pth through the
    reference's own demo load path (demo/demo_face.py:123-130)."""
    import torch

    with _cpu_reference_env():
        from model.TSNet import TSNet as RefTSNet

        model = RefTSNet(is_train=False, label_nc=2, n_blocks=n_blocks,
                         n_downsampling=n_downsampling, n_source=n_source)
        checkpoint = torch.load(ckpt_path, map_location="cpu",
                                weights_only=False)
        model.img_enc.load_state_dict(checkpoint["img_enc"])
        model.lbl_enc.load_state_dict(checkpoint["lbl_enc"])
        model.fuse_net.load_state_dict(checkpoint["fuse_net"])
        model.dec.load_state_dict(checkpoint["dec"])
        model.eval()
    return model


def load_reference_tsnet_pose(ckpt_path: str, n_source: int = 3,
                              n_blocks: int = 4, n_downsampling: int = 3,
                              label_nc: int = 25):
    """Construct the reference POSE TSNet (model/TSNet_pose.py:206-280)
    and load a .pth through the reference demo's load path
    (demo/demo_pose.py:120-133): is_train=False, use_mask=True, the
    shipped IMG_MEAN — so the fixed foreground-column compositing
    (TSNet_pose.py:276-280,416-417) runs exactly as the reference demo
    runs it."""
    import torch

    with _cpu_reference_env():
        from model.TSNet_pose import TSNet as RefTSNetPose

        model = RefTSNetPose(is_train=False, label_nc=label_nc,
                             n_blocks=n_blocks,
                             n_downsampling=n_downsampling,
                             n_source=n_source, use_mask=True)
        checkpoint = torch.load(ckpt_path, map_location="cpu",
                                weights_only=False)
        model.img_enc.load_state_dict(checkpoint["img_enc"])
        model.lbl_enc.load_state_dict(checkpoint["lbl_enc"])
        model.fuse_net.load_state_dict(checkpoint["fuse_net"])
        model.dec.load_state_dict(checkpoint["dec"])
        model.eval()
    return model


def run_reference_clip(model, src_imgs, src_lbls, src_bboxes,
                       tar_lbls, tar_bboxes) -> np.ndarray:
    """The reference per-frame inference loop (demo/demo_face.py:185-192).

    Args (numpy, reference wire format — the L4->L2 contract):
      src_imgs:   (S, 3, H, W) BGR mean-subtracted, NOT /255.
      src_lbls:   (S, label_nc, H, W) one-hot.
      src_bboxes: (S, H, W).
      tar_lbls:   (F, label_nc, H, W) one-hot. / tar_bboxes: (F, H, W).

    Returns rec frames (F, 3, H, W) in model space (tanh range).
    """
    import torch

    s = src_imgs.shape[0]
    src_img_list = [torch.from_numpy(src_imgs[i:i + 1].copy())
                    for i in range(s)]
    src_lbl_list = [torch.from_numpy(src_lbls[i:i + 1].copy())
                    for i in range(s)]
    src_bbox_list = [torch.from_numpy(src_bboxes[i:i + 1].copy())
                     for i in range(s)]
    outs = []
    with _cpu_reference_env(), torch.no_grad():
        for f in range(tar_lbls.shape[0]):
            model.set_test_input(
                src_img_list, src_lbl_list, src_bbox_list,
                torch.from_numpy(tar_lbls[f:f + 1].copy()),
                torch.from_numpy(tar_bboxes[f:f + 1].copy()))
            model.forward()
            outs.append(model.rec_tar_img.cpu().numpy()[0])
    return np.stack(outs)
