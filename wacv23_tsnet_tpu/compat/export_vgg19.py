"""Export torchvision VGG19 conv weights to the npz the loss loader reads.

Run wherever torchvision IS installed (it isn't in the TPU image):

    python -m wacv23_tsnet_tpu.compat.export_vgg19 --out weights/vgg19_features.npz

Only the 13 convs up to conv5_1 are needed (reference model/TSNet.py:542-560
slices torchvision `vgg19(pretrained=True).features` at relu{1..5}_1).
"""

from __future__ import annotations

import argparse

import numpy as np

# torchvision `features` indices of the 13 convs up to conv5_1
TORCHVISION_CONV_IDS = (0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28)


def export(out_path: str) -> None:
    from torchvision import models

    try:
        features = models.vgg19(
            weights=models.VGG19_Weights.IMAGENET1K_V1).features
    except AttributeError:   # older torchvision
        features = models.vgg19(pretrained=True).features

    arrays = {}
    for i, idx in enumerate(TORCHVISION_CONV_IDS):
        conv = features[idx]
        arrays[f"conv{i}_kernel"] = (
            conv.weight.detach().numpy().transpose(2, 3, 1, 0))  # OIHW->HWIO
        arrays[f"conv{i}_bias"] = conv.bias.detach().numpy()
    np.savez(out_path, **arrays)
    print(f"wrote {out_path} ({len(arrays)} arrays)")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="weights/vgg19_features.npz")
    args = p.parse_args(argv)
    export(args.out)


if __name__ == "__main__":
    main()
