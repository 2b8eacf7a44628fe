from .base import (TSNetConfig, TrainConfig, face_config, pose_config,
                   toy_config, toy_pose_config)

__all__ = ["TSNetConfig", "TrainConfig", "face_config", "pose_config",
           "toy_config", "toy_pose_config"]
