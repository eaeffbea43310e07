"""File-to-masks inference: run a trained model on an arbitrary cine file.

The practical serving entry a user of the reference framework needs after
training ("weights saved to outputs/", reference:
website/src/pages/[lang]/reprod/index.astro:267-269): point the model at a
video and get per-frame masks.  Inputs: EchoNet-style .avi (cv2), a
directory of frame PNGs (CAMUS processed-artifact clips), or a raw CAMUS
MetaImage .mhd half-sequence.  Inference is chunked streaming with carried
memory state (O(1) in video length), staged with explicit async
device_put (CLAUDE.md rule 8); outputs are a masks.npz plus optional
overlay PNGs (eval/vis.py).

Two backends: a checkpointed in-process model, or an exported StableHLO
serving artifact (io/export.py) — the latter validates the deployment
path end-to-end.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np


def load_frames(path: str, image_size: int,
                host_resize: bool = True) -> np.ndarray:
    """Decode any supported cine source → (F, H, W, 1) uint8.

    ``host_resize=False`` keeps the NATIVE decode resolution (host work =
    decode only); the model step then resizes on device via the fused
    matmul preproc (ops/preproc.py) — the serving configuration for
    arbitrary-resolution input (SURVEY §2.3 fused resize/normalize).
    """
    if os.path.isdir(path):
        from PIL import Image
        names = sorted(n for n in os.listdir(path)
                       if n.lower().endswith((".png", ".jpg", ".jpeg")))
        if not names:
            raise FileNotFoundError(f"no image frames in {path}")
        frames = []
        for n in names:
            img = Image.open(os.path.join(path, n)).convert("L")
            if host_resize and img.size != (image_size, image_size):
                img = img.resize((image_size, image_size))
            frames.append(np.asarray(img, np.uint8))
        return np.stack(frames)[..., None]
    if path.lower().endswith(".avi") or path.lower().endswith(".mp4"):
        import cv2
        cap = cv2.VideoCapture(path)
        frames = []
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            if frame.ndim == 3:
                frame = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
            if host_resize and frame.shape[:2] != (image_size, image_size):
                frame = cv2.resize(frame, (image_size, image_size),
                                   interpolation=cv2.INTER_AREA)
            frames.append(frame)
        cap.release()
        if not frames:
            raise IOError(f"failed to decode {path}")
        return np.stack(frames)[..., None]
    if path.lower().endswith(".mhd"):
        from gdkvm_tpu.data.camus_raw import _resize_stack, read_mhd
        vol, _ = read_mhd(path)                       # (F, H, W)
        if host_resize:
            vol = _resize_stack(vol, image_size, is_mask=False)
        return vol.astype(np.uint8)[..., None]
    raise ValueError(f"unsupported input {path!r} (want .avi/.mp4, .mhd, "
                     f"or a directory of PNG frames)")


def infer_video_model(model, params, frames: np.ndarray, chunk: int = 16,
                      model_size: Optional[int] = None) -> np.ndarray:
    """Chunked streaming inference with the in-process model.

    frames: (F, H, W, 1) uint8 → masks uint8 (argmax on device, one jitted
    call per chunk, state carried).  When the frames are NOT at
    ``model_size`` (native-resolution decode), resize+normalize runs
    INSIDE the jit, fused with the forward (ops/preproc.py) — the host
    ships raw decode bytes only.  Masks come back at the model resolution.
    """
    import jax
    from gdkvm_tpu.eval.streaming import _jitted_mask_step, \
        _jitted_mask_step_native

    src_hw = frames.shape[1:3]
    if model_size is not None and src_hw != (model_size, model_size):
        step = _jitted_mask_step_native(model, model_size)
    else:
        step = _jitted_mask_step(model)
    f = frames.shape[0]
    masks = []
    state = None            # model.apply zero-initializes inside the jit
    for lo in range(0, f, chunk):
        part = frames[lo:lo + chunk]
        t = part.shape[0]
        if t < chunk:
            part = np.pad(part, ((0, chunk - t), (0, 0), (0, 0), (0, 0)))
        dev = jax.device_put(part)                    # async, staged
        m, state = step(params, dev, state)
        masks.append(np.asarray(jax.device_get(m))[:t])
    return np.concatenate(masks)


def infer_video_artifact(art_dir: str, frames: np.ndarray) -> np.ndarray:
    """Chunked streaming inference through an exported StableHLO artifact
    (batch-1 export expected); argmax on host."""
    import jax
    from gdkvm_tpu.io.export import load_artifact

    sm = load_artifact(art_dir)
    if sm.batch != 1:
        raise ValueError(f"infer needs a batch-1 artifact, got {sm.batch}")
    sig_hw = tuple(sm.meta["signature"]["frames_u8"][2:4])
    if frames.shape[1:3] != sig_hw:
        raise ValueError(
            f"frames are {frames.shape[1:3]} but the artifact was exported "
            f"for {sig_hw} — decode with the artifact's image size "
            f"(gdkvm infer does this automatically)")
    chunk = sm.chunk
    mem, seen = sm.init_state()
    f = frames.shape[0]
    masks = []
    for lo in range(0, f, chunk):
        part = frames[lo:lo + chunk]
        t = part.shape[0]
        if t < chunk:
            part = np.pad(part, ((0, chunk - t), (0, 0), (0, 0), (0, 0)))
        # Explicit async staging (CLAUDE.md rule 8): a numpy arg passed
        # straight to the jitted exported call uploads ~60× slower.
        dev = jax.device_put(part[None])
        logits, mem, seen = sm.step(dev, mem, seen)
        masks.append(np.asarray(jax.device_get(logits))[0, :t].argmax(-1)
                     .astype(np.uint8))
    return np.concatenate(masks)


def artifact_image_size(art_dir: str) -> int:
    """Input H (=W) the artifact was exported for (from meta.json)."""
    with open(os.path.join(art_dir, "meta.json")) as fp:
        return int(json.load(fp)["signature"]["frames_u8"][2])


def run_inference(frames: np.ndarray, out_dir: str, *, model=None,
                  params=None, artifact: Optional[str] = None,
                  chunk: int = 16, overlay_every: int = 0,
                  model_size: Optional[int] = None) -> dict:
    """Infer masks and write masks.npz (+ overlay PNGs); returns summary.

    ``model_size``: set when frames are native-resolution — the resize
    happens on device inside the jitted step (infer_video_model)."""
    from gdkvm_tpu.eval.vis import overlay as make_overlay

    if artifact is not None:
        masks = infer_video_artifact(artifact, frames)
    else:
        masks = infer_video_model(model, params, frames, chunk=chunk,
                                  model_size=model_size)
    os.makedirs(out_dir, exist_ok=True)
    np.savez_compressed(os.path.join(out_dir, "masks.npz"), masks=masks)
    n_overlays = 0
    if overlay_every > 0:
        from PIL import Image
        ov_dir = os.path.join(out_dir, "overlays")
        os.makedirs(ov_dir, exist_ok=True)
        mh, mw = masks.shape[1:3]
        for t in range(0, frames.shape[0], overlay_every):
            fr = frames[t]
            if fr.shape[:2] != (mh, mw):      # native-res input: match mask
                fr = np.asarray(Image.fromarray(fr[..., 0]).resize(
                    (mw, mh)), np.uint8)[..., None]
            img = make_overlay(fr, masks[t])
            Image.fromarray(img).save(
                os.path.join(ov_dir, f"frame_{t:05d}.png"))
            n_overlays += 1
    summary = {
        "frames": int(frames.shape[0]),
        "classes_present": sorted(int(c) for c in np.unique(masks)),
        "foreground_fraction": float((masks > 0).mean()),
        "out": out_dir,
        "overlays": n_overlays,
    }
    with open(os.path.join(out_dir, "infer.json"), "w") as fp:
        json.dump(summary, fp, indent=1)
    return summary
