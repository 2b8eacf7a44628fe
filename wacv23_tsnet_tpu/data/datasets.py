"""TS-Net datasets: face / pose, train / test.

Host-side numpy/PIL pipelines reproducing the reference's four Dataset
classes (dataset/dataset_video_face.py, dataset/dataset_video_pose.py).
Each sample is a dict of stacked arrays in the reference's NCHW value
conventions — images BGR float32 mean-subtracted, labels integer class
maps, bboxes 0/1 masks — ready for `models.api.TSNet.set_*_input`.

Notable reimplementation choices:
- `skimage.img_as_bool(resize(...))` (binary mask resize, face sets)
  becomes cv2 float resize + 0.5 threshold — same pixels except along
  anti-aliased stroke borders (skimage isn't in this environment).
- Random sampling flows through an injectable `random.Random` so clips
  are reproducible under a seed.
"""

from __future__ import annotations

import json
import os
import random as _random
from typing import Optional

import cv2
import numpy as np
from PIL import Image, ImageOps

from .augment import apply_jitter, sample_jitter_factors
from .codecs import image_to_labels
from .face import (FaceRetargeter, face_bbox_mask, face_crop_coords,
                   render_face_edges, shift_keypoints)
from .posenorm import retarget_pose, shift_pts
from .rasterize import render_openpose, render_person, valid_keypoints
from .smoothing import smooth_keypoint_track

IMG_MEAN = np.array((101.84807705937696, 112.10832843463207,
                     111.65973036298041), dtype=np.float32)


# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------

def _listdir_sorted(path):
    names = os.listdir(path)
    names.sort()
    return names


def _resize_bool(arr: np.ndarray, size) -> np.ndarray:
    """Binary-mask resize: float bilinear + ABSOLUTE 0.5 threshold.

    Mirrors skimage `img_as_bool(resize(x))`: the uint8 input maps to
    [0, 1] and thresholds at 0.5 of the dtype range (127.5), NOT at half
    the post-resize maximum — downscaling may attenuate stroke peaks and
    a relative threshold would thicken masks.
    """
    scale = 255.0 if arr.dtype == np.uint8 and arr.max() > 1 else 1.0
    interp = (cv2.INTER_AREA if size[0] < arr.shape[1] else cv2.INTER_LINEAR)
    resized = cv2.resize(arr.astype(np.float32) / scale, size,
                         interpolation=interp)
    return (resized > 0.5).astype(np.uint8)


def _to_bgr_mean_sub(img: Image.Image, mean) -> np.ndarray:
    arr = np.asarray(img.convert("RGB"))[:, :, ::-1].astype(np.float32)
    return (arr - mean).transpose(2, 0, 1)


def _crop_pil(img: Image.Image, coords_yx):
    min_y, max_y, min_x, max_x = coords_yx
    return img.crop((min_x, min_y, max_x, max_y))


def _pad_square(img: Image.Image) -> Image.Image:
    w, h = img.size
    s = max(w, h)
    dw, dh = s - w, s - h
    return ImageOps.expand(img, (dw // 2, dh // 2, dw - dw // 2,
                                 dh - dh // 2))


# ---------------------------------------------------------------------------
# face datasets
# ---------------------------------------------------------------------------

class FaceDatasetTrain:
    """Per-video clip sampler for face training (reference
    FaceDatasetTrainVideoMask, dataset_video_face.py:22-238)."""

    def __init__(self, label_path: str, image_path: str, mean=IMG_MEAN,
                 n_frame_total: int = 10, is_jitter: bool = True,
                 is_mirror: bool = True, img_size=(256, 256),
                 rng: Optional[_random.Random] = None):
        self.mean = np.asarray(mean, np.float32)
        self.n_frame_total = n_frame_total
        self.is_jitter = is_jitter
        self.is_mirror = is_mirror
        self.img_size = img_size
        self.rng = rng or _random.Random()
        self.videos = []
        lbl_dirs = _listdir_sorted(label_path)
        img_dirs = _listdir_sorted(image_path)
        assert len(lbl_dirs) == len(img_dirs), "label/image dir mismatch"
        for ld, vd in zip(lbl_dirs, img_dirs):
            lbls = [os.path.join(label_path, ld, f)
                    for f in _listdir_sorted(os.path.join(label_path, ld))]
            imgs = [os.path.join(image_path, vd, f)
                    for f in _listdir_sorted(os.path.join(image_path, vd))]
            assert len(lbls) == len(imgs), f"frame count mismatch in {ld}"
            self.videos.append((lbls, imgs,
                                _listdir_sorted(os.path.join(label_path, ld))))

    def __len__(self):
        return len(self.videos)

    def __getitem__(self, index: int) -> dict:
        rng = self.rng
        lbls, imgs, names = self.videos[index % len(self.videos)]
        n = self.n_frame_total
        if len(lbls) > n:
            start = rng.choice(range(len(lbls) - n + 1))
        else:
            start = rng.choice(range(n))

        anchor_ky = np.loadtxt(lbls[start % len(lbls)], delimiter=",")
        coords, _ = face_crop_coords(anchor_ky, jitter=True, rng=rng)
        bw = max(1, (coords[1] - coords[0]) // 256)

        frames, labels, bboxes, out_names = [], [], [], []
        for i in range(n):
            j = (start + i) % len(lbls)
            img = _crop_pil(Image.open(imgs[j]), coords)
            ky = shift_keypoints(np.loadtxt(lbls[j], delimiter=","), coords)
            lbl = render_face_edges(ky, img.size, bw=bw)
            bbox = face_bbox_mask(ky, img.size)
            frames.append(img.resize(self.img_size))
            labels.append(_resize_bool(lbl, self.img_size))
            bboxes.append(_resize_bool(bbox, self.img_size))
            out_names.append(names[j])

        if self.is_jitter:
            factors = sample_jitter_factors(rng)
            frames = [apply_jitter(f, factors) for f in frames]
        if self.is_mirror and rng.random() < 0.5:
            frames = [ImageOps.mirror(f) for f in frames]
            labels = [lbl[:, ::-1].copy() for lbl in labels]
            bboxes = [bb[:, ::-1].copy() for bb in bboxes]

        return {
            "img": np.stack([_to_bgr_mean_sub(f, self.mean) for f in frames]),
            "lbl": np.stack(labels),
            "bbox": np.stack(bboxes),
            "names": out_names,
        }


class FaceDatasetTest:
    """Whole-clip face test loader with cross-identity face retargeting
    and 5-frame keypoint smoothing (reference FaceDatasetTest,
    dataset_video_face.py:248-530)."""

    def __init__(self, sub_images_path, sub_labels_path, dri_images_path,
                 dri_labels_path, mean=IMG_MEAN, img_size=(256, 256),
                 max_frame_num: Optional[int] = None,
                 image_ext: str = ".png"):
        self.paths = (sub_images_path, sub_labels_path,
                      dri_images_path, dri_labels_path)
        self.mean = np.asarray(mean, np.float32)
        self.img_size = img_size
        self.max_frame_num = max_frame_num
        self.image_ext = image_ext

    def __len__(self):
        return 1

    def _load_clip(self, images_path, labels_path, retargeter, is_ref,
                   smooth: bool):
        ky_names = _listdir_sorted(labels_path)
        if self.max_frame_num is not None:
            ky_names = ky_names[:self.max_frame_num]
        first = np.loadtxt(os.path.join(labels_path, ky_names[0]),
                           delimiter=",")
        coords, _ = face_crop_coords(first, jitter=False)
        bw = max(1, (coords[1] - coords[0]) // 256)
        kys = [shift_keypoints(
            np.loadtxt(os.path.join(labels_path, n), delimiter=","), coords)
            for n in ky_names]

        if is_ref:
            retargeter.fit_reference(kys)
        else:
            kys = retargeter.retarget(kys)
            if smooth:
                kys = list(smooth_keypoint_track(np.stack(kys)))

        imgs, lbls, boxes, names = [], [], [], []
        for name, ky in zip(ky_names, kys):
            img_name = name.replace(".txt", self.image_ext)
            img = _crop_pil(
                Image.open(os.path.join(images_path, img_name)), coords)
            lbl = render_face_edges(np.asarray(ky), img.size, bw=bw)
            bbox = face_bbox_mask(np.asarray(ky), img.size)
            imgs.append(_to_bgr_mean_sub(img.resize(self.img_size), self.mean))
            lbls.append(_resize_bool(lbl, self.img_size))
            boxes.append(_resize_bool(bbox, self.img_size))
            names.append(img_name)
        return {"img": np.stack(imgs), "lbl": np.stack(lbls),
                "bbox": np.stack(boxes), "names": names}

    def __getitem__(self, index: int) -> dict:
        sub_img, sub_lbl, dri_img, dri_lbl = self.paths
        retargeter = FaceRetargeter()
        src = self._load_clip(sub_img, sub_lbl, retargeter, is_ref=True,
                              smooth=False)
        tar = self._load_clip(dri_img, dri_lbl, retargeter, is_ref=False,
                              smooth=True)
        return {"src": src, "tar": tar}


# ---------------------------------------------------------------------------
# pose datasets
# ---------------------------------------------------------------------------

def _person_crop_coords(pose_pts, size, train, rng, scale=None,
                        aspect_ratio=0.5):
    """Person-region crop box (xs, ys, xe, ye) (reference
    get_crop_coords, dataset_video_pose.py:219-253)."""
    w, h = size
    valid = pose_pts[:, 0] != 0
    x, y = pose_pts[valid, 0], pose_pts[valid, 1]
    x_cen = int(x.min() + x.max()) // 2 if x.shape[0] else w // 2
    if y.shape[0]:
        y_min = max(y.min(), min(pose_pts[15, 1], pose_pts[16, 1]))
        y_max = max(pose_pts[11, 1], pose_pts[14, 1])
        if y_max == 0:
            y_max = y.max()
        y_cen = int(y_min + y_max) // 2
        y_len = y_max - y_min
    else:
        y_cen = y_len = h // 2
    if scale is None:
        scale = rng.uniform(1.4, 1.6) if train else 1.5
    bh = int(min(h, max(h // 4, y_len * scale))) // 2
    bw = int(bh * aspect_ratio)
    if train:
        x_cen += int(rng.uniform(-0.05, 0.05) * bw)
        y_cen += int(rng.uniform(-0.05, 0.05) * bh)
    x_cen = max(bw, min(w - bw, x_cen))
    y_cen = max(bh, min(h - bh, y_cen))
    return [x_cen - bw, y_cen - bh, x_cen + bw, y_cen + bh], scale


def _pose_bbox_from_label(lbl_img: Image.Image) -> Image.Image:
    """Nonzero-label extent + 1/16 margin (reference get_bbox_image,
    dataset_video_pose.py:255-272)."""
    arr = np.sum(np.asarray(lbl_img) != 0, axis=2)
    h, w = arr.shape
    mask = np.zeros((h, w), np.uint8)
    nz = np.nonzero(arr)
    if nz[0].size:
        y_min = int(max(0, nz[0].min() - h // 16))
        y_max = int(min(h, nz[0].max() + h // 16))
        x_min = int(max(0, nz[1].min() - w // 16))
        x_max = int(min(w, nz[1].max() + w // 16))
        mask[y_min:y_max, x_min:x_max] = 255
    return Image.fromarray(mask)


class PoseDatasetTrain:
    """Dance clip sampler for pose training (reference
    PoseDatasetTrainVideoMask, dataset_video_pose.py:18-272)."""

    def __init__(self, json_path, label_path, image_path, mean=IMG_MEAN,
                 n_frame_total: int = 10, is_jitter: bool = True,
                 is_mirror: bool = True, basic_point_only: bool = False,
                 remove_face_labels: bool = False, interval: int = 1,
                 rng: Optional[_random.Random] = None):
        self.mean = np.asarray(mean, np.float32)
        self.n_frame_total = n_frame_total
        self.is_jitter = is_jitter
        self.is_mirror = is_mirror
        self.basic_point_only = basic_point_only
        self.remove_face_labels = remove_face_labels
        self.interval = interval
        self.img_size = (128, 256)
        self.rng = rng or _random.Random()
        with open(json_path) as f:
            video_dict = json.load(f)
        ids = sorted(int(k) for k in video_dict)
        self.videos = []
        for vid in ids:
            frames = sorted(video_dict[str(vid)])
            vdir = "%05d" % vid
            self.videos.append((
                [os.path.join(label_path, vdir, f[:-4] + "_keypoints.json")
                 for f in frames],
                [os.path.join(image_path, vdir, f) for f in frames],
                ["%03d_frame_%05d" % (vid, int("".join(filter(str.isdigit, f))))
                 for f in frames],
            ))

    def __len__(self):
        return len(self.videos)

    def _render(self, json_path, size, crop_coords, scale):
        lbl_rgb, pose_pts, _ = render_openpose(
            json_path, size, train=True, rng=self.rng,
            basic_point_only=self.basic_point_only,
            remove_face_labels=self.remove_face_labels)
        if crop_coords is None:
            crop_coords, scale = _person_crop_coords(
                pose_pts, size, train=True, rng=self.rng, scale=scale)
        xs, ys, xe, ye = crop_coords
        lbl = Image.fromarray(lbl_rgb[ys:ye, xs:xe])
        return lbl, crop_coords, scale

    def __getitem__(self, index: int) -> dict:
        rng = self.rng
        lbls, imgs, names = self.videos[index % len(self.videos)]
        n, interval = self.n_frame_total, self.interval
        if len(lbls) > (n - 1) * interval:
            start = rng.choice(range(len(lbls) - (n - 1) * interval))
        else:
            start = rng.choice(range(n))
            interval = 1

        anchor_img = Image.open(imgs[start % len(imgs)])
        _, coords, scale = self._render(lbls[start % len(lbls)],
                                        anchor_img.size, None, None)

        frames, labels, bboxes, out_names = [], [], [], []
        for i in range(n):
            j = (start + i * interval) % len(lbls)
            img = Image.open(imgs[j])
            lbl, _, _ = self._render(lbls[j], img.size, coords, scale)
            bbox = _pose_bbox_from_label(lbl)
            xs, ys, xe, ye = coords
            img = img.crop((xs, ys, xe, ye))
            frames.append(_pad_square(img.resize(self.img_size)))
            labels.append(_pad_square(lbl.resize(self.img_size,
                                                 Image.NEAREST)))
            bboxes.append(_pad_square(bbox.resize(self.img_size,
                                                  Image.NEAREST)))
            out_names.append(names[j])

        if self.is_jitter:
            factors = sample_jitter_factors(rng)
            frames = [apply_jitter(f, factors) for f in frames]
        if self.is_mirror and rng.random() < 0.5:
            frames = [ImageOps.mirror(f) for f in frames]
            labels = [ImageOps.mirror(l) for l in labels]
            bboxes = [ImageOps.mirror(b) for b in bboxes]

        return {
            "img": np.stack([_to_bgr_mean_sub(f, self.mean) for f in frames]),
            "lbl": np.stack([image_to_labels(np.asarray(l), "pose",
                                             self.basic_point_only,
                                             self.remove_face_labels)
                             for l in labels]),
            "bbox": np.stack([(np.asarray(b) != 0).astype(np.uint8)
                              for b in bboxes]),
            "names": out_names,
        }


class PoseDatasetTest:
    """Cross-identity dance test pairs with pre-smoothed driving keypoints
    and gender-pair skeleton retargeting (reference PoseDatasetTestVideo,
    dataset_video_pose.py:275-607)."""

    def __init__(self, test_pairs, sub_json_path, msk_json_path, label_path,
                 smooth_label_path, image_path, mean=IMG_MEAN,
                 n_frame_total: int = 30, basic_point_only: bool = False,
                 remove_face_labels: bool = False):
        self.mean = np.asarray(mean, np.float32)
        self.n_frame_total = n_frame_total
        self.basic_point_only = basic_point_only
        self.remove_face_labels = remove_face_labels
        self.img_size = (128, 256)
        self.img_pth = image_path
        self.lbl_pth = label_path
        self.smooth_lbl_pth = smooth_label_path
        video_dict = {}
        for p in (sub_json_path, msk_json_path):
            with open(p) as f:
                video_dict.update(json.load(f))
        self.video_dict = video_dict
        self.pairs = test_pairs

    def __len__(self):
        return len(self.pairs)

    @staticmethod
    def _is_female(vid: int) -> bool:
        # dataset convention (reference dataset_video_pose.py:306-309)
        return vid <= 91 or vid in (147, 151)

    def _finalize(self, img, lbl, bbox):
        img = _pad_square(img.resize(self.img_size))
        lbl = _pad_square(lbl.resize(self.img_size, Image.NEAREST))
        bbox = _pad_square(bbox.resize(self.img_size, Image.NEAREST))
        return (_to_bgr_mean_sub(img, self.mean),
                image_to_labels(np.asarray(lbl), "pose",
                                self.basic_point_only,
                                self.remove_face_labels),
                (np.asarray(bbox) != 0).astype(np.uint8))

    def __getitem__(self, index: int) -> dict:
        vid1, vid2 = self.pairs[index].split(" ")
        f1, f2 = self._is_female(int(vid1)), self._is_female(int(vid2))
        diff_sex = "" if f1 == f2 else ("fm" if f1 else "mf")

        # ---- subject clip ------------------------------------------------
        src_frames = self.video_dict[vid1][:self.n_frame_total]
        src = {"img": [], "lbl": [], "bbox": [], "names": []}
        coords = scale = None
        for i, frame in enumerate(sorted(src_frames)):
            img = Image.open(os.path.join(self.img_pth, "%05d" % int(vid1),
                                          frame))
            jpth = os.path.join(self.lbl_pth, "%05d" % int(vid1),
                                frame[:-4] + "_keypoints.json")
            lbl_rgb, pose_pts, _ = render_openpose(
                jpth, img.size, train=False,
                basic_point_only=self.basic_point_only,
                remove_face_labels=self.remove_face_labels)
            if coords is None:
                coords, scale = _person_crop_coords(
                    pose_pts, img.size, train=False, rng=_random, scale=None)
            xs, ys, xe, ye = coords
            lbl = Image.fromarray(lbl_rgb[ys:ye, xs:xe])
            bbox = _pose_bbox_from_label(lbl)
            a, b, c = self._finalize(img.crop((xs, ys, xe, ye)), lbl, bbox)
            src["img"].append(a)
            src["lbl"].append(b)
            src["bbox"].append(c)
            src["names"].append(frame)

        # ---- driving clip (pre-smoothed keypoints + retarget) -----------
        from .smoothing import load_json_tricks
        smooth = load_json_tricks(os.path.join(
            self.smooth_lbl_pth, "%05d.json" % int(vid2)))
        tar_frames = self.video_dict[vid2][:self.n_frame_total]
        tar = {"img": [], "lbl": [], "bbox": [], "names": []}
        tcoords = None
        for i, frame in enumerate(sorted(tar_frames)[:len(
                smooth["pose_keypoints_2d"])]):
            img = Image.open(os.path.join(self.img_pth, "%05d" % int(vid2),
                                          frame))
            pts = {
                "pose": np.asarray(smooth["pose_keypoints_2d"][i]),
                "face": np.asarray(smooth["face_keypoints_2d"][i]),
                "hand_l": np.asarray(smooth["hand_left_keypoints_2d"][i]),
                "hand_r": np.asarray(smooth["hand_right_keypoints_2d"][i]),
            }
            if tcoords is None:
                tcoords, _ = _person_crop_coords(
                    pts["pose"], img.size, train=False, rng=_random,
                    scale=scale)
            xs, ys, xe, ye = tcoords
            local = shift_pts(pts, (xs, ys))
            if diff_sex:
                local = retarget_pose(local, image_h=ye - ys, mode=diff_sex)
            lbl_rgb = render_person(
                local["pose"], local["face"], local["hand_l"],
                local["hand_r"], (xe - xs, ye - ys), train=False,
                basic_point_only=self.basic_point_only,
                remove_face_labels=self.remove_face_labels)
            lbl = Image.fromarray(lbl_rgb)
            bbox = _pose_bbox_from_label(lbl)
            a, b, c = self._finalize(img.crop((xs, ys, xe, ye)), lbl, bbox)
            tar["img"].append(a)
            tar["lbl"].append(b)
            tar["bbox"].append(c)
            tar["names"].append(frame)

        return {
            "src": {k: (np.stack(v) if k != "names" else v)
                    for k, v in src.items()},
            "tar": {k: (np.stack(v) if k != "names" else v)
                    for k, v in tar.items()},
            "diff_sex": diff_sex,
        }
