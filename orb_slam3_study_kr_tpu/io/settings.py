"""Typed settings loader for the reference's calibration YAMLs.

Replaces src/Settings.cc: reads both the "File.version: 1.0" format
(Camera1.fx etc.) and the legacy flat format (Camera.fx), including OpenCV
matrix nodes (rows/cols/data), and builds the TrackerConfig + camera model.
Required keys abort with the offending name, like the reference's
readParameter (Settings.cc:35-108).
"""

import re

import numpy as np


def _parse_opencv_yaml(path):
    """OpenCV FileStorage YAML: strip the %YAML directive and !! tags, then
    parse with PyYAML."""
    import yaml

    with open(path) as f:
        text = f.read()
    text = re.sub(r"^%YAML:.*$", "", text, flags=re.M)
    text = re.sub(r"!!opencv-matrix", "", text)
    return yaml.safe_load(text)


class Settings:
    def __init__(self, path):
        self.raw = _parse_opencv_yaml(path) or {}
        self.version = str(self.raw.get("File.version", "legacy"))

    def get(self, key, default=None, required=False):
        if key in self.raw:
            return self.raw[key]
        if required:
            raise KeyError(f"required settings key missing: {key}")
        return default

    def matrix(self, key):
        node = self.get(key)
        if node is None:
            return None
        if isinstance(node, dict):
            return np.asarray(node["data"], np.float64).reshape(
                node["rows"], node["cols"])
        return np.asarray(node, np.float64)

    # ------------------------------------------------------------------
    def camera_kind(self):
        t = self.get("Camera.type", self.get("Camera1.type", "PinHole"))
        return str(t)

    def _cam_key(self, name):
        # v1.0 uses Camera1.*, legacy uses Camera.*
        for prefix in ("Camera1", "Camera"):
            v = self.get(f"{prefix}.{name}")
            if v is not None:
                return float(v)
        raise KeyError(f"required settings key missing: Camera.{name}")

    def make_camera(self, width=None, height=None):
        from orb_slam3_study_kr_tpu.cameras import make_kb8, make_pinhole

        w = int(self.get("Camera.width", width or 752))
        h = int(self.get("Camera.height", height or 480))
        fx = self._cam_key("fx")
        fy = self._cam_key("fy")
        cx = self._cam_key("cx")
        cy = self._cam_key("cy")
        kind = self.camera_kind()
        if kind == "KannalaBrandt8":
            ks = [self._cam_key(f"k{i}") for i in (1, 2, 3, 4)]
            return make_kb8(fx, fy, cx, cy, *ks, width=w, height=h)
        k1 = self.get("Camera1.k1", self.get("Camera.k1", 0.0)) or 0.0
        k2 = self.get("Camera1.k2", self.get("Camera.k2", 0.0)) or 0.0
        p1 = self.get("Camera1.p1", self.get("Camera.p1", 0.0)) or 0.0
        p2 = self.get("Camera1.p2", self.get("Camera.p2", 0.0)) or 0.0
        k3 = self.get("Camera1.k3", self.get("Camera.k3", 0.0)) or 0.0
        return make_pinhole(fx, fy, cx, cy, k1, k2, p1, p2, k3,
                            width=w, height=h)

    def tracker_config(self):
        from orb_slam3_study_kr_tpu.pipeline.tracking import TrackerConfig

        fx = self._cam_key("fx")
        fy = self._cam_key("fy")
        cx = self._cam_key("cx")
        cy = self._cam_key("cy")
        kind = self.camera_kind()
        if kind == "KannalaBrandt8":
            camera_model = "kb8"
            dist = tuple(self._cam_key(f"k{i}") for i in (1, 2, 3, 4))
        else:
            camera_model = "pinhole"
            dist = tuple(
                float(self.get(f"Camera1.{k}",
                               self.get(f"Camera.{k}", 0.0)) or 0.0)
                for k in ("k1", "k2", "p1", "p2", "k3")
            )
        return TrackerConfig(
            width=int(self.get("Camera.width", 752)),
            height=int(self.get("Camera.height", 480)),
            fx=fx, fy=fy, cx=cx, cy=cy, dist=dist,
            camera_model=camera_model,
            fps=float(self.get("Camera.fps", 30.0)),
            n_features=int(self.get("ORBextractor.nFeatures", 1000)),
            orb_n_levels=int(self.get("ORBextractor.nLevels", 8)),
            orb_scale_factor=float(self.get("ORBextractor.scaleFactor", 1.2)),
            orb_ini_th_fast=int(self.get("ORBextractor.iniThFAST", 20)),
            orb_min_th_fast=int(self.get("ORBextractor.minThFAST", 7)),
            bf=float(self.get("Camera.bf", 0.0) or 0.0)
            if camera_model != "kb8" else 0.0,
        )

    # ------------------------------------------------------------------
    def stereo(self):
        """Stereo-rig description (Settings.h:58-123 stereo block).

        Returns None for monocular configs, else a dict with:
          bf / baseline / th_depth — rectified-rig scalars;
          R_rl, t_rl — pose of the left camera in the right camera frame,
            from the v1.0 `Stereo.T_c1_c2` (the reference's Tlr) when
            present (KB8 rigs are never rectified — Settings.cc
            readCamera2);
          cam2 — (fx, fy, cx, cy, dists...) of the right camera when the
            file carries Camera2.* keys.
        """
        bf = self.get("Camera.bf")
        T12 = self.matrix("Stereo.T_c1_c2")
        if T12 is None:
            T12 = self.matrix("Tlr")
        if bf is None and T12 is None:
            return None
        out = {"bf": float(bf) if bf is not None else None,
               "th_depth": float(self.get(
                   "ThDepth", self.get("Stereo.ThDepth", 35.0)) or 35.0)}
        if T12 is not None:
            # T_c1_c2 maps cam2 (right) coords into cam1 (left):
            # p_l = R12 p_r + t12  =>  p_r = R12^T p_l - R12^T t12.
            R12 = T12[:3, :3]
            t12 = T12[:3, 3]
            out["R_rl"] = R12.T
            out["t_rl"] = -R12.T @ t12
            out["baseline"] = float(np.linalg.norm(t12))
        elif bf is not None:
            fx = self._cam_key("fx")
            out["baseline"] = float(bf) / fx
            out["R_rl"] = np.eye(3)
            out["t_rl"] = np.array([-out["baseline"], 0.0, 0.0])
        if self.get("Camera2.fx") is not None:
            ks = ("k1", "k2", "k3", "k4") if self.camera_kind() == \
                "KannalaBrandt8" else ("k1", "k2", "p1", "p2", "k3")
            out["cam2"] = tuple(
                float(self.get(f"Camera2.{k}", 0.0) or 0.0)
                for k in ("fx", "fy", "cx", "cy", *ks))
        return out

    def atlas_files(self):
        """System.LoadAtlasFromFile / SaveAtlasToFile (Settings.h:120-123)."""
        return (self.get("System.LoadAtlasFromFile"),
                self.get("System.SaveAtlasToFile"))

    def imu_calib(self):
        from orb_slam3_study_kr_tpu.imu import ImuCalib

        if self.get("IMU.NoiseGyro") is None:
            return None
        Tbc = self.matrix("IMU.T_b_c1")
        if Tbc is None:
            Tbc = self.matrix("Tbc")
        R_bc = Tbc[:3, :3] if Tbc is not None else None
        t_bc = Tbc[:3, 3] if Tbc is not None else None
        return ImuCalib.make(
            noise_gyro=float(self.get("IMU.NoiseGyro", required=True)),
            noise_acc=float(self.get("IMU.NoiseAcc", required=True)),
            walk_gyro=float(self.get("IMU.GyroWalk", required=True)),
            walk_acc=float(self.get("IMU.AccWalk", required=True)),
            freq=float(self.get("IMU.Frequency", 200.0)),
            R_bc=R_bc, t_bc=t_bc,
        )
