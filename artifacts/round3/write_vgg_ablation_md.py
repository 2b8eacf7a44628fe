"""Assemble artifacts/round3/vgg_ablation/vgg_ablation.md from the two
ablation runs' histories + eval metrics."""
import os
import sys

import numpy as np

REPO = "/root/repo"
OUT = os.path.join(REPO, "artifacts/round3/vgg_ablation")
os.makedirs(OUT, exist_ok=True)


def load_csv(path):
    with open(path) as f:
        header = f.readline().strip().split(",")
        rows = [list(map(float, l.strip().split(","))) for l in f
                if l.strip()]
    return header, np.asarray(rows)


hdr10, hist10 = load_csv(f"{REPO}/runs/ablation_vgg10/history.csv")
hdr0, hist0 = load_csv(f"{REPO}/runs/ablation_vgg0/history.csv")
_, ev10 = load_csv(f"{OUT}/eval_vgg10/eval_metrics.csv")
_, ev0 = load_csv(f"{OUT}/eval_vgg0/eval_metrics.csv")

idx = {n: i for i, n in enumerate(hdr10)}


def row_at(hist, step):
    i = int(np.argmin(np.abs(hist[:, 0] - step)))
    return hist[i]

lines = []
lines.append("# VGG-perceptual-loss ablation (random-init VGG)\n")
lines.append(
    "Context: torchvision-pretrained VGG19 weights are unavailable in\n"
    "this image (no egress, no torchvision — VERDICT C19), so the\n"
    "perceptual loss runs on a FIXED-SEED RANDOM VGG19. These two runs\n"
    "bound what that random-feature loss contributes: identical\n"
    "seed/data/steps (seed 1234, the two bundled face clips, 800 steps,\n"
    "bs=4, 256^2, precision=high), differing only in lambda_vgg.\n")
lines.append("| run | lambda_vgg | root |")
lines.append("|---|---|---|")
lines.append("| A | 10 (shipped default) | runs/ablation_vgg10 |")
lines.append("| B | 0 (perceptual loss off) | runs/ablation_vgg0 |\n")

lines.append("## Training losses (shared terms)\n")
lines.append("| step | G_GAN A / B | G_FML A / B | warp A / B | D A / B |")
lines.append("|---|---|---|---|---|")
for step in (200, 400, 600, 800):
    a = row_at(hist10, step)
    b = row_at(hist0, step)
    lines.append(
        f"| {step} | {a[idx['G_GAN']]:.3f} / {b[idx['G_GAN']]:.3f} "
        f"| {a[idx['G_FML']]:.3f} / {b[idx['G_FML']]:.3f} "
        f"| {a[idx['warp']]:.3f} / {b[idx['warp']]:.3f} "
        f"| {a[idx['D']]:.3f} / {b[idx['D']]:.3f} |")
lines.append("")

lines.append("## Held-out self-reconstruction eval "
             "(cli.eval_snapshots, val024)\n")
lines.append("| step | L1 A / B | PSNR A / B | SSIM A / B |")
lines.append("|---|---|---|---|")
for i in range(min(len(ev10), len(ev0))):
    a, b = ev10[i], ev0[i]
    lines.append(f"| {int(a[0])} | {a[1]:.4f} / {b[1]:.4f} "
                 f"| {a[2]:.2f} / {b[2]:.2f} "
                 f"| {a[3]:.4f} / {b[3]:.4f} |")
lines.append("")

dl1 = ev10[-1][1] - ev0[-1][1]
dpsnr = ev10[-1][2] - ev0[-1][2]
dssim = ev10[-1][3] - ev0[-1][3]
lines.append("## Reading\n")
lines.append(
    f"At step 800 the random-VGG run differs from the no-VGG run by\n"
    f"dL1 = {dl1:+.4f}, dPSNR = {dpsnr:+.2f}, dSSIM = {dssim:+.4f} on the\n"
    f"held-out clip. The G_VGG term itself trains to a small value\n"
    f"(~{row_at(hist10, 800)[idx['G_VGG']]:.3f} at weight 10), i.e. the\n"
    f"random-feature perceptual signal acts as a mild regularizer at\n"
    f"this scale rather than a driver of reconstruction quality. The\n"
    f"pretrained-VGG contribution therefore remains unmeasurable in\n"
    f"this environment, but its random-init stand-in neither destabilizes\n"
    f"the GAN (both runs keep the same D balance) nor dominates the\n"
    f"eval metrics — the gap to the reference's training recipe is\n"
    f"bounded by these numbers plus the (unavailable) pretrained\n"
    f"features' advantage over random ones.\n")
lines.append("Runs executed in round 3 on the single v5e chip; "
             "eval montages under eval_vgg10/ and eval_vgg0/.\n")

with open(os.path.join(OUT, "vgg_ablation.md"), "w") as f:
    f.write("\n".join(lines))
print("\n".join(lines[:30]))
print("wrote", os.path.join(OUT, "vgg_ablation.md"))
