"""BEHAVE dataset toolkit: Kinect calibration + the GT evaluation path.

Reference parity: the load-bearing parts of the vendored BEHAVE tooling
(``utils/behave.py``, 1.4k LoC):
- :class:`KinectCalib` — color/depth intrinsics and extrinsics, point
  projection, depth-map -> point cloud (``behave.py:31-120``).
- :func:`prepare_affordance_extraction_inputs_for_behave` — put GT BEHAVE
  frames in the same canonical frame as generated samples (raw2normal,
  lowres center, fit params; ``behave.py:1062-1215``) — the quantitative
  evaluation path against ground truth.
- :func:`evaluate_against_gt` — the paper-table machinery: SIM/MAE between
  predicted and GT aggregated contact distributions
  (``constants/coma/quant.py`` quant_keys + ``utils/evaluation.py``).
"""
from __future__ import annotations

import dataclasses
import os
import pickle
from typing import Any, Dict, Optional

import numpy as np

from coma_tpu.affordance.contact import aggregate_contact
from coma_tpu.affordance.evaluation import quant_metrics
from coma_tpu.affordance.io import load_pickle
from coma_tpu.geometry.mesh import compute_vertex_normals, normalize_rows
from coma_tpu.geometry.transforms import rodrigues


@dataclasses.dataclass
class KinectCalib:
    """Azure-Kinect color/depth calibration (pinhole + OpenCV distortion).

    Constructed from the BEHAVE calibration json dict (``behave.py:31-81``).
    """

    calibration_matrix: np.ndarray   # (3, 3) color intrinsics
    dist_coeffs: np.ndarray
    image_size: tuple
    depth_matrix: np.ndarray
    depth2color_R: np.ndarray
    depth2color_t: np.ndarray
    pc_table: Optional[np.ndarray] = None   # (H, W, 2) precomputed xy table

    @classmethod
    def from_json(cls, calibration: Dict[str, Any], pc_table=None) -> "KinectCalib":
        color = calibration["color"]
        K = np.eye(3)
        K[0, 0], K[1, 1] = color["fx"], color["fy"]
        K[:2, 2] = (color["cx"], color["cy"])
        depth = calibration["depth"]
        Kd = np.eye(3)
        Kd[0, 0], Kd[1, 1] = depth["fx"], depth["fy"]
        Kd[:2, 2] = (depth["cx"], depth["cy"])
        return cls(
            calibration_matrix=K,
            dist_coeffs=np.asarray(color["opencv"][4:]),
            image_size=(color["width"], color["height"]),
            depth_matrix=Kd,
            depth2color_R=np.asarray(
                calibration["depth_to_color"]["rotation"]
            ).reshape(3, 3),
            depth2color_t=np.asarray(calibration["depth_to_color"]["translation"]),
            pc_table=pc_table,
        )

    def project_points(self, points: np.ndarray) -> np.ndarray:
        """Color-camera points (N, 3) -> distorted pixel coords (N, 2)
        (``behave.py:project_points:87-92``)."""
        x = points[:, 0] / points[:, 2]
        y = points[:, 1] / points[:, 2]
        k = np.zeros(8)
        k[: len(self.dist_coeffs)] = self.dist_coeffs[:8]
        r2 = x * x + y * y
        radial = (1 + k[0] * r2 + k[1] * r2**2 + k[4] * r2**3) / (
            1 + k[5] * r2 + k[6] * r2**2 + k[7] * r2**3
        )
        xd = x * radial + 2 * k[2] * x * y + k[3] * (r2 + 2 * x * x)
        yd = y * radial + k[2] * (r2 + 2 * y * y) + 2 * k[3] * x * y
        fx, fy = self.calibration_matrix[0, 0], self.calibration_matrix[1, 1]
        cx, cy = self.calibration_matrix[:2, 2]
        return np.stack([xd * fx + cx, yd * fy + cy], axis=-1)

    def dmap2pc(self, depth_mm: np.ndarray) -> np.ndarray:
        """Depth map (mm) -> point cloud via the precomputed xy table
        (``behave.py:dmap2pc:95-107``)."""
        assert self.pc_table is not None, "needs the precomputed pc table"
        table = np.dstack([self.pc_table, np.ones(self.pc_table.shape[:2] + (1,))])
        d = depth_mm.astype(np.float64) / 1000.0
        d[depth_mm == 0] = np.nan
        pc = table * d[..., None]
        valid = np.isfinite(pc[:, :, 0])
        return pc[valid]


def prepare_affordance_extraction_inputs_for_behave(
    human_mesh_pth: str,
    human_mesh_pth_type: str,
    human_downsample_metadata: Dict[str, Any],
    object_downsample_metadata: Dict[str, Any],
    human_use_downsample_pcd_raw: bool,
    object_use_downsample_pcd_raw: bool,
    lowres_center_pth: str,
    raw2normal_pth: str,
    obj_param_pth: str,
    eps: float,
) -> Dict[str, np.ndarray]:
    """GT BEHAVE frame -> the canonical frame of generated samples.

    The object's raw scan coordinates are first un-normalized
    (``(v - t_raw2normal) @ R_raw2normal``), recentred on the low-res
    template center, then posed with the per-frame fit (Rodrigues angle +
    translation) — exactly ``behave.py:1140-1175``.
    """
    import jax.numpy as jnp

    if human_mesh_pth_type == "obj":
        from coma_tpu.geometry.mesh import load_obj

        mesh = load_obj(human_mesh_pth)
        human_verts_orig = mesh.vertices
        human_faces_orig = mesh.faces
    else:
        data = load_pickle(human_mesh_pth)
        human_verts_orig = np.asarray(data["verts"])
        human_faces_orig = np.asarray(data["faces"], np.int64)
    human_vertex_normals_orig = normalize_rows(
        compute_vertex_normals(human_verts_orig, human_faces_orig), eps
    )

    obj_verts_orig = np.asarray(object_downsample_metadata["obj_vertices_original"])
    obj_vertex_normals_orig = normalize_rows(
        np.asarray(object_downsample_metadata["obj_vertex_normals_original"])
    )

    assert not human_use_downsample_pcd_raw, "human must use mesh representation"
    h_idx = np.asarray(human_downsample_metadata["downsample_indices"], np.int64)
    human_verts = human_verts_orig[h_idx]
    human_vertex_normals = human_vertex_normals_orig[h_idx]

    if object_use_downsample_pcd_raw:
        obj_verts = np.asarray(object_downsample_metadata["downsampled_pcd_points_raw"])
        obj_vertex_normals = np.asarray(
            object_downsample_metadata["downsampled_pcd_normal_raw"]
        )
    else:
        o_idx = np.asarray(object_downsample_metadata["downsample_indices"], np.int64)
        obj_verts = obj_verts_orig[o_idx]
        obj_vertex_normals = obj_vertex_normals_orig[o_idx]

    # BEHAVE-specific canonicalization
    lowres_center = np.asarray(load_pickle(lowres_center_pth)["obj_lowres_center"])
    raw2normal = load_pickle(raw2normal_pth)
    R_r2n = np.asarray(raw2normal["R_raw2normal"])
    t_r2n = np.asarray(raw2normal["t_raw2normal"])

    obj_verts = (obj_verts - t_r2n[None]) @ R_r2n - lowres_center[None]
    obj_vertex_normals = obj_vertex_normals @ R_r2n

    obj_param = load_pickle(obj_param_pth)
    angle = np.asarray(obj_param["angle"], np.float64)
    trans = np.asarray(obj_param["trans"], np.float64).reshape(1, 3)
    R_fit = np.asarray(rodrigues(jnp.asarray(angle[None], jnp.float64)
                                 if angle.ndim == 1 else jnp.asarray(angle)))[0]
    obj_verts = obj_verts @ R_fit.T + trans
    obj_vertex_normals = normalize_rows(obj_vertex_normals @ R_fit.T, eps)

    return dict(
        human_verts=human_verts.astype(np.float32),
        human_normals=human_vertex_normals.astype(np.float32),
        obj_verts=obj_verts.astype(np.float32),
        obj_normals=obj_vertex_normals.astype(np.float32),
    )


def evaluate_against_gt(
    pred_state, gt_state, significant_contact_ratio: float = 0.0, eps: float = 1e-12
) -> Dict[str, Dict[str, float]]:
    """SIM/MAE between predicted and GT aggregated contact distributions.

    Reference: the quant_mode outputs named in ``constants/coma/quant.py``
    (aggr_object_contact_metrics / aggr_human_contact_metrics) computed via
    ``utils/evaluation.py``.
    """
    out = {}
    for which, key in (("human", "aggr_human_contact_metrics"),
                       ("obj", "aggr_object_contact_metrics")):
        pred, _ = aggregate_contact(pred_state, which, significant_contact_ratio)
        gt, _ = aggregate_contact(gt_state, which, significant_contact_ratio)
        out[key] = quant_metrics(np.asarray(pred), np.asarray(gt), eps)
    return out


# --------------------------------------------------------------------------
# BEHAVE sequence reading (reference: utils/behave.py:418-630 SeqInfo /
# KinectFrameReader / FrameDataReader). numpy/PIL based — no psbody/cv2.
# --------------------------------------------------------------------------

class SeqInfo:
    """Sequence metadata from ``<seq>/info.json`` (``behave.py:418-466``):
    category, gender, kinect ids, calibration paths (made absolute)."""

    def __init__(self, seq_path: str):
        import json

        with open(os.path.join(seq_path, "info.json")) as fh:
            self.info = json.load(fh)
        for name in ("config", "empty", "intrinsic"):
            if self.info.get(name) is not None:
                self.info[name] = os.path.join(seq_path, self.info[name])

    def get_obj_name(self, convert: bool = False) -> str:
        """COCO-detector name conversion (``behave.py:424-430``)."""
        cat = self.info["cat"]
        if convert:
            if "chair" in cat:
                return "chair"
            if "ball" in cat:
                return "sports ball"
        return cat

    @property
    def kids(self):
        return list(self.info.get("kinects", range(3)))

    def kinect_count(self) -> int:
        return len(self.kids)


class BehaveSequence:
    """Frame-level reader for one BEHAVE sequence directory.

    Frames are subdirectories named ``t<sec>.<subframe>`` holding
    ``k{kid}.color.jpg`` / ``k{kid}.depth.png`` plus per-frame fits:
    ``person/<save_name>/person_fit.pkl`` and
    ``<obj>/<save_name>/<obj>_fit.pkl``. Combines the reference's
    KinectFrameReader (``:479``) and FrameDataReader (``:631``) surface that
    the evaluation path needs; fit params feed
    :func:`prepare_affordance_extraction_inputs_for_behave`.
    """

    def __init__(self, seq_path: str, ext: str = "jpg"):
        self.seq_path = seq_path.rstrip("/")
        self.ext = ext
        self.seq_info = SeqInfo(self.seq_path)
        self.kids = self.seq_info.kids
        self.frames = self._list_frames()

    def _list_frames(self):
        def key(name):
            t, sub = name.split(".")[:2]
            return (int(t.replace("t", "")), int(sub))

        return sorted(
            (
                f
                for f in os.listdir(self.seq_path)
                if os.path.isdir(os.path.join(self.seq_path, f)) and f.startswith("t")
            ),
            key=key,
        )

    def __len__(self):
        return len(self.frames)

    def frame_folder(self, idx: int) -> str:
        return os.path.join(self.seq_path, self.frames[idx])

    def frame_index(self, frame_time: str) -> int:
        return self.frames.index(frame_time)

    def times2indices(self, frame_times):
        return [self.frame_index(t) for t in frame_times]

    def get_color_image(self, idx: int, kid: int) -> np.ndarray:
        from PIL import Image

        pth = os.path.join(self.frame_folder(idx), f"k{kid}.color.{self.ext}")
        return np.asarray(Image.open(pth).convert("RGB"))

    def get_depth_image(self, idx: int, kid: int) -> np.ndarray:
        """uint16 depth in mm (``k{kid}.depth.png``)."""
        from PIL import Image

        pth = os.path.join(self.frame_folder(idx), f"k{kid}.depth.png")
        return np.asarray(Image.open(pth))

    def objfit_param_file(self, idx: int, save_name: str) -> str:
        name = self.seq_info.get_obj_name(convert=True)
        return os.path.join(
            self.frame_folder(idx), name, save_name, f"{name}_fit.pkl"
        )

    def get_objfit_params(self, idx: int, save_name: str):
        """(angle (3,), trans (3,)) or (None, None) (``behave.py:736-744``)."""
        pth = self.objfit_param_file(idx, save_name)
        if save_name is None or not os.path.isfile(pth):
            return None, None
        with open(pth, "rb") as fh:
            fit = pickle.load(fh)
        return fit["angle"], fit["trans"]

    def smplfit_param_file(self, idx: int, save_name: str) -> str:
        return os.path.join(
            self.frame_folder(idx), "person", save_name, "person_fit.pkl"
        )

    def get_smplfit_params(self, idx: int, save_name: str):
        """(pose, betas, trans) or Nones (``behave.py:746-755``)."""
        pth = self.smplfit_param_file(idx, save_name)
        if save_name is None or not os.path.isfile(pth):
            return None, None, None
        with open(pth, "rb") as fh:
            fit = pickle.load(fh)
        return fit["pose"], fit["betas"], fit["trans"]

    def smplfit_meshfile_as_smplx(self, idx: int, save_name: str, ext: str = "ply") -> str:
        return os.path.join(
            self.frame_folder(idx), "person", save_name, f"person_fit_smplx.{ext}"
        )

    def get_person_pointcloud(self, idx: int):
        """(N, 3) scan points of the segmented person, or None."""
        pth = os.path.join(self.frame_folder(idx), "person", "person.ply")
        if not os.path.isfile(pth):
            return None
        from coma_tpu.utils.ply import read_ply_pointcloud

        return read_ply_pointcloud(pth)[0]
