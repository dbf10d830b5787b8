"""Input mini-language parsing + primitives directory layout.

Rebuilds `iPERCore/services/options/meta_info.py` (parse_effect_str:15,
parse_parts_str:50, SrcMetaInputInfo:97, RefMetaInputInfo:172, MetaProcess:268,
parse_ref_input:472, parse_src_input:522).

Grammar:
  inputs     := input ('|' input)*
  input      := bare_path | kv (',' kv)*
  kv         := key '?=' value
  src keys   := path, name, bg_path, parts ('-'-separated part names)
  ref keys   := path, name, audio, fps, pose_fc, cam_fc, effect
  effect     := sub (';' sub)*;  sub := 'View-<deg>' | 'BT-<frame>[-<dur>]'
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Optional


def parse_effect_str(effect_str: str) -> dict:
    """`effect?=View-45;BT-30-180` -> {"View": 45.0, "BT": [(30, 180)]} —
    `meta_info.py:15-48`."""
    out: dict = {}
    for sub in effect_str.split(";"):
        if not sub:
            continue
        toks = sub.split("-")
        kind = toks[0]
        if kind == "View":
            out["View"] = float(toks[1])
        elif kind == "BT":
            frame = int(toks[1])
            dur = int(toks[2]) if len(toks) > 2 else 60
            out.setdefault("BT", []).append((frame, dur))
    return out


def parse_parts_str(parts_str: str) -> list[str]:
    """`parts?=head-torso` -> ["head", "torso"] — `meta_info.py:50-95`."""
    return [p for p in parts_str.split("-") if p]


def _parse_kv(s: str) -> dict:
    """Parse one `key1?=value1,key2?=value2` (or bare path) segment."""
    if "?=" not in s:
        return {"path": s}
    out = {}
    for pair in s.split(","):
        if not pair:
            continue
        if "?=" not in pair:
            continue
        kv = pair.split("?=")
        if len(kv) != 2 or not kv[1]:
            continue
        out[kv[0].strip()] = kv[1].strip()
    return out


@dataclass
class SrcMetaInfo:
    """Source input descriptor — `SrcMetaInputInfo:97`."""

    path: str = ""
    name: Optional[str] = None
    bg_path: str = ""
    parts: list = field(default_factory=lambda: ["all"])

    @classmethod
    def parse(cls, s: str) -> "SrcMetaInfo":
        kv = _parse_kv(s)
        info = cls(
            path=kv.get("path", ""),
            name=kv.get("name"),
            bg_path=kv.get("bg_path", ""),
        )
        if "parts" in kv:
            info.parts = parse_parts_str(kv["parts"])
        if info.name is None and info.path:
            info.name = os.path.split(info.path.rstrip("/"))[-1]
        return info


@dataclass
class RefMetaInfo:
    """Reference input descriptor — `RefMetaInputInfo:172`."""

    path: str = ""
    name: Optional[str] = None
    audio: Optional[str] = None
    fps: float = 25.0
    pose_fc: float = 300.0
    cam_fc: float = 100.0
    effect: dict = field(default_factory=dict)

    @classmethod
    def parse(cls, s: str) -> "RefMetaInfo":
        kv = _parse_kv(s)
        info = cls(path=kv.get("path", ""), name=kv.get("name"), audio=kv.get("audio"))
        if "fps" in kv:
            info.fps = float(kv["fps"])
        if "pose_fc" in kv:
            info.pose_fc = float(kv["pose_fc"])
        if "cam_fc" in kv:
            info.cam_fc = float(kv["cam_fc"])
        if "effect" in kv:
            info.effect = parse_effect_str(kv["effect"])
        if info.name is None and info.path:
            info.name = os.path.split(info.path.rstrip("/"))[-1]
        return info


def parse_src_input(src_input: str) -> list[SrcMetaInfo]:
    """`parse_src_input` (`meta_info.py:522-542`)."""
    return [SrcMetaInfo.parse(s) for s in src_input.split("|") if s]


def parse_ref_input(ref_input: str) -> list[RefMetaInfo]:
    """`parse_ref_input` (`meta_info.py:472-520`)."""
    return [RefMetaInfo.parse(s) for s in ref_input.split("|") if s]


@dataclass
class MetaProcess:
    """Primitive directories for one input — `MetaProcess:268`:
    `<output_dir>/primitives/<name>/{processed,synthesis}`."""

    name: str
    output_dir: str

    @property
    def primitives_dir(self) -> str:
        return os.path.join(self.output_dir, "primitives", self.name)

    @property
    def processed_dir(self) -> str:
        return os.path.join(self.primitives_dir, "processed")

    @property
    def synthesis_dir(self) -> str:
        return os.path.join(self.primitives_dir, "synthesis")

    @property
    def vid_info_path(self) -> str:
        return os.path.join(self.processed_dir, "vid_info.json")

    def make_dirs(self) -> "MetaProcess":
        os.makedirs(self.processed_dir, exist_ok=True)
        os.makedirs(self.synthesis_dir, exist_ok=True)
        return self


def checkpoints_dir(output_dir: str, model_id: str) -> str:
    """`<output_dir>/models/<model_id>/` (`options_setup.py:140-187`)."""
    d = os.path.join(output_dir, "models", model_id)
    os.makedirs(d, exist_ok=True)
    return d
