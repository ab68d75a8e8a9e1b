"""--custom-parameters merge semantics (CommandOptionsUtilities.cs) and
per-stage config translation."""

import pytest

from canvas_tpu.config import CanvasConfig
from canvas_tpu.pipeline import custom_params as cp


def test_merge_overrides_in_place():
    out = cp.merge_command_line_options("-a 1 -b 2 -c 3", "-b 9")
    assert out == "-a 1 -b 9 -c 3"


def test_merge_inserts_after_updated_option():
    out = cp.merge_command_line_options("-a 1 -c 3", "-a 2 -x 7")
    assert out == "-a 2 -x 7 -c 3"


def test_merge_inserts_at_start_or_end():
    assert cp.merge_command_line_options("-a 1", "-x 7") == "-x 7 -a 1"
    assert cp.merge_command_line_options("-a 1", "-x 7",
                                         insert_at_end=True) == "-a 1 -x 7"


def test_merge_removal_directive():
    # '#foo' removes -foo/--foo and its value (CommandOptionsUtilities.cs:16)
    out = cp.merge_command_line_options("-a 1 --foo bar -b 2", "#foo")
    assert out == "-a 1 -b 2"
    # removal of a missing option is a no-op
    assert cp.merge_command_line_options("-a 1", "#foo") == "-a 1"


def test_merge_equals_and_negative_values():
    out = cp.merge_command_line_options("--param=3", "--param=-4")
    assert out == "--param=-4"
    out = cp.merge_command_line_options("-p 3", "-p -4")
    assert out == "-p -4"


def test_parse_custom_parameters_merges_repeats():
    d = cp.parse_custom_parameters(
        ["CanvasBin,-d 50", "CanvasBin,-m Fragment", "CanvasClean,-w 25"])
    assert d["CanvasBin"] == "-d 50 -m Fragment"
    assert d["CanvasClean"] == "-w 25"
    with pytest.raises(ValueError):
        cp.parse_custom_parameters(["NoCommaHere"])


def test_apply_custom_parameters_to_config():
    config = CanvasConfig()
    cp.apply_custom_parameters(config, {
        "CanvasBin": "-d 50 -m Fragment -z 2048",
        "CanvasClean": "--mode LOESS -w 25",
        "CanvasPartition": "-m CBS",
    })
    assert config.counts_per_bin == 50
    assert config.coverage_mode == "Fragment"
    assert config.fixed_bin_size == 2048
    assert config.gc_norm_mode == "LOESS"
    assert config.min_bins_per_gc_weighted_median == 25
    assert config.partition_method == "CBS"


def test_apply_rejects_unknown_tool_and_flag():
    config = CanvasConfig()
    with pytest.raises(ValueError):
        cp.apply_custom_parameters(config, {"CanvasNope": "-x 1"})
    with pytest.raises(ValueError):
        cp.apply_custom_parameters(config, {"CanvasBin": "--nosuchflag 1"})
    with pytest.raises(ValueError):
        cp.apply_custom_parameters(config, {"CanvasBin": "-m NotAMode"})
