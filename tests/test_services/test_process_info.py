import numpy as np

from ipercore_tpu.services.process_info import ProcessInfo


def test_roundtrip_and_resume_flags(tmp_path):
    d = str(tmp_path / "processed")
    info = ProcessInfo(d, name="subj")
    assert not info.check_has_been_processed()
    info.mark_run("detector", n_frames=10)
    info.mark_run("cropper")
    info.set_array("smpls", np.zeros((10, 85), np.float32))
    info.meta["valid_img_names"] = [f"{i:05d}.png" for i in range(10)]
    info.serialize()

    back = ProcessInfo.deserialize(d)
    assert back.has_run("detector") and back.has_run("cropper")
    assert not back.has_run("pose3d")
    assert back.meta["stages"]["detector"]["n_frames"] == 10
    assert back.get_array("smpls").shape == (10, 85)


def test_read_src_info_front_back_selection(tmp_path):
    d = str(tmp_path / "p")
    info = ProcessInfo(d, name="s")
    smpls = np.arange(8 * 85, dtype=np.float32).reshape(8, 85)
    info.set_array("smpls", smpls)
    info.set_array("ft_ids", np.asarray([3, 1]))
    info.set_array("bk_ids", np.asarray([7, 5]))
    info.meta["valid_img_names"] = [f"{i}.png" for i in range(8)]
    src = info.read_src_info(num_source=2)
    assert src["src_ids"] == [3, 7]  # 1 front + 1 back
    assert src["offsets"] is None
    np.testing.assert_array_equal(src["smpls"], smpls[[3, 7]])

    src4 = info.read_src_info(num_source=4)
    assert src4["src_ids"] == [3, 1, 7, 5]


def test_read_ref_info(tmp_path):
    info = ProcessInfo(str(tmp_path), name="r")
    info.set_array("smpls", np.zeros((5, 85)))
    info.meta["valid_img_names"] = ["a", "b", "c", "d", "e"]
    ref = info.read_ref_info()
    assert ref["smpls"].shape == (5, 85)
    assert len(ref["img_names"]) == 5
