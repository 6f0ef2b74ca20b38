"""Weights-day parity runbook (tools/parity.py): the --help surface and the
synthetic dry-run must execute end-to-end in this weights-less image
(VERDICT r3 next #6)."""

import json

import pytest

from imagdressing_tpu.tools import parity


def test_help_exits_clean(capsys):
    with pytest.raises(SystemExit) as e:
        parity.main(["--help"])
    assert e.value.code == 0
    out = capsys.readouterr().out
    assert "record_reference record" in out  # the runbook is in the help


def test_dry_run_end_to_end(tmp_path):
    parity.main(["--dry-run", "--out_dir", str(tmp_path)])
    report = json.loads((tmp_path / "parity_report.json").read_text())
    assert report["ok"] and report["mode"] == "dry-run"
    # all four reference pipelines replayed (VERDICT r4 next #2)
    assert sorted(report["presets"]) == ["basic", "inpaint", "ipa_pose",
                                         "pose"]
    # the replay gate really compared the full RECORD_SPEC surface
    names = report["presets"]["basic"]["tensors_compared"]
    for key in ("text_embeds", "cloth_tokens", "ref_latents_nhwc",
                "eps_step0_nhwc", "final_latents_nhwc"):
        assert key in names
    assert any(n.startswith("sa_hidden::") for n in names)
    # preset-specific surfaces
    pose_names = report["presets"]["pose"]["tensors_compared"]
    assert any(n.startswith("cn_down_res_step0::") for n in pose_names)
    assert "cn_mid_res_step0" in pose_names
    ipa_names = report["presets"]["ipa_pose"]["tensors_compared"]
    assert "face_tokens" in ipa_names and "face_clip_penult" in ipa_names
    inp_names = report["presets"]["inpaint"]["tensors_compared"]
    for key in ("image_latents_nhwc", "mask_latent_nhwc",
                "recomposed_latents_step0_nhwc"):
        assert key in inp_names
    assert (tmp_path / "seed42.png").exists()


def test_real_mode_guides_when_golden_missing(tmp_path, capsys):
    with pytest.raises(SystemExit) as e:
        parity.main(["--golden", str(tmp_path / "absent.npz")])
    assert e.value.code == 2
    out = capsys.readouterr().out
    assert "record_reference record" in out  # prints the exact next command
