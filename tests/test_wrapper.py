"""Embedding-API tests (Canvas.Wrapper contract): load-or-run checkpoint,
stub naming convention, output move."""

from pathlib import Path

import numpy as np
import pytest

from canvas_tpu import wrapper
from tests.test_pipeline import CNV_PLAN, make_bam, reference_dir  # noqa: F401


def test_output_stub_roundtrip(tmp_path):
    stub = tmp_path / "Sample_S1"
    out = wrapper.CanvasOutput.from_stub(stub)
    assert out.cnv_vcf.name == "Sample_S1.vcf.gz"
    assert out.coverage_and_variant_frequencies.name == \
        "Sample_S1.CoverageAndVariantFrequency.txt"
    assert out.variant_frequencies.name == "Sample_S1.VFResults.txt.gz"
    assert not out.exists()


def test_annotation_gate(tmp_path):
    caller = wrapper.GermlineWgsCnvCaller(reference_folder=str(tmp_path))
    with pytest.raises(FileNotFoundError):
        caller.run({"s": wrapper.GermlineWgsInput(bam="x.bam")},
                   tmp_path / "sandbox")


def test_checkpoint_runs_then_loads(reference_dir, tmp_path):  # noqa: F811
    bam = tmp_path / "s.bam"
    make_bam(bam, np.random.default_rng(3), CNV_PLAN)

    caller = wrapper.GermlineWgsCnvCaller(reference_folder=str(reference_dir))
    stub_dir = tmp_path / "results"
    ckpt = wrapper.CanvasCheckpoint(
        caller, stub_fn=lambda name: stub_dir / f"{name}_CNV")

    ran = ckpt.run({"s1": wrapper.GermlineWgsInput(bam=str(bam))},
                   tmp_path / "sandbox")
    assert ran["s1"].cnv_vcf == stub_dir / "s1_CNV.vcf.gz"
    assert ran["s1"].cnv_vcf.exists()
    assert ran["s1"].coverage_and_variant_frequencies.exists()

    # second run must load from the convention without invoking the caller
    class Boom:
        def run(self, inputs, sandbox):
            raise AssertionError("caller must not re-run")

    loaded = wrapper.CanvasCheckpoint(
        Boom(), stub_fn=lambda name: stub_dir / f"{name}_CNV").run(
        {"s1": wrapper.GermlineWgsInput(bam=str(bam))}, tmp_path / "sandbox2")
    assert loaded["s1"].cnv_vcf == ran["s1"].cnv_vcf
