from .codecs import (POSE_PALETTE, image_to_labels, labels_to_image,
                     labels_to_onehot)
from .rasterize import (interp_curve, stamp_edge, render_openpose,
                        parse_openpose_json, valid_keypoints)
from .face import (FACE_PART_LIST, render_face_edges, face_bbox_mask,
                   face_crop_coords, retarget_face_keypoints,
                   FaceRetargeter)
from .smoothing import smooth_keypoint_track
from .datasets import (FaceDatasetTrain, FaceDatasetTest,
                       PoseDatasetTrain, PoseDatasetTest)
from .loader import Loader

__all__ = [
    "POSE_PALETTE", "image_to_labels", "labels_to_image", "labels_to_onehot",
    "interp_curve", "stamp_edge", "render_openpose", "parse_openpose_json",
    "valid_keypoints",
    "FACE_PART_LIST", "render_face_edges", "face_bbox_mask",
    "face_crop_coords", "retarget_face_keypoints", "FaceRetargeter",
    "smooth_keypoint_track",
    "FaceDatasetTrain", "FaceDatasetTest", "PoseDatasetTrain",
    "PoseDatasetTest",
    "Loader",
]
