"""Mini-language parsing — parity with `tests/test_services/test_metainfo.py`."""
from ipercore_tpu.services.meta_info import (
    parse_src_input, parse_ref_input, parse_effect_str, parse_parts_str, MetaProcess,
)


def test_parse_ref_full_kv():
    refs = parse_ref_input(
        "path?=/v1.mp4,name?=n1,audio?=/a1.mp3,fps?=30,pose_fc?=300,cam_fc?=100|"
        "path?=/v2.mp4,name?=n2,fps?=25"
    )
    assert len(refs) == 2
    assert refs[0].path == "/v1.mp4" and refs[0].name == "n1"
    assert refs[0].audio == "/a1.mp3" and refs[0].fps == 30
    assert refs[1].name == "n2" and refs[1].fps == 25
    assert refs[1].pose_fc == 300.0  # default


def test_parse_ref_bare_paths():
    refs = parse_ref_input("/video1.mp4|/video2.mp4")
    assert [r.path for r in refs] == ["/video1.mp4", "/video2.mp4"]
    assert refs[0].name == "video1.mp4"


def test_parse_ref_missing_values_skipped():
    refs = parse_ref_input("path?=/v.mp4,name?=,fps?=30")
    assert refs[0].name == "v.mp4"  # empty value -> fallback to basename
    assert refs[0].fps == 30


def test_parse_src_with_parts_and_bg():
    srcs = parse_src_input("path?=/imgs,name?=p1,bg_path?=/bg.png,parts?=head-torso")
    assert srcs[0].bg_path == "/bg.png"
    assert srcs[0].parts == ["head", "torso"]


def test_parse_effects():
    e = parse_effect_str("View-45;BT-30-180;BT-90")
    assert e["View"] == 45.0
    assert e["BT"] == [(30, 180), (90, 60)]
    assert parse_parts_str("upper-lower") == ["upper", "lower"]


def test_meta_process_dirs(tmp_path):
    mp = MetaProcess(name="subj", output_dir=str(tmp_path)).make_dirs()
    import os
    assert os.path.isdir(mp.processed_dir)
    assert os.path.isdir(mp.synthesis_dir)
    assert mp.processed_dir.endswith("primitives/subj/processed")


def test_meta_roundtrip_to_str():
    from ipercore_tpu.services.meta_info import SrcMetaInfo, RefMetaInfo

    s = parse_src_input("path?=/imgs,name?=p1,bg_path?=/bg.png,parts?=head-torso")[0]
    s2 = SrcMetaInfo.parse(s.to_str())
    assert (s2.path, s2.name, s2.bg_path, s2.parts) == (s.path, s.name, s.bg_path, s.parts)

    r = parse_ref_input(
        "path?=/v.mp4,name?=d,fps?=30,pose_fc?=250,effect?=View-45;BT-30-180")[0]
    r2 = RefMetaInfo.parse(r.to_str())
    assert (r2.path, r2.name, r2.fps, r2.pose_fc, r2.effect) == (
        r.path, r.name, r.fps, r.pose_fc, r.effect)


def test_resolve_media_noop_without_video(tmp_path):
    from ipercore_tpu.services.meta_info import RefMetaInfo

    r = RefMetaInfo(path=str(tmp_path), name="folder")
    out = r.resolve_media(str(tmp_path))
    assert out.fps == 25.0 and out.audio is None
