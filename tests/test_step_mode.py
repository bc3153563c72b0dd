"""--step manual mode (reference launchman.py / crawlerman semantics):
one wave per invocation against the snapshot store; repeated --step
--resume invocations advance the crawl wave by wave."""

import pytest

from spacetime_crawler4_spark.crawl.run import main as run_main


@pytest.mark.slow
def test_step_mode_advances_one_wave_per_call(spark, corpus_dir, tmp_path, capsys):
    state = str(tmp_path / "state")
    args = [
        "--pages", f"{corpus_dir}/pages.parquet",
        "--robots", f"{corpus_dir}/robots.parquet",
        "--seeds", f"{corpus_dir}/seeds.parquet",
        "--state", state,
        "--step",
    ]
    out1 = run_main(args)
    assert out1["waves"] == 1  # exactly one wave ran
    capsys.readouterr()
    out2 = run_main([*args, "--resume"])
    assert out2["waves"] == 2  # resumed from the store, advanced one more
    # the step dump printed per-row state for the processed wave
    dumped = capsys.readouterr().out
    assert "wave counters:" in dumped
    assert "urlhash" in dumped
    # frontier grew between steps (wave 0 expanded the seeds)
    assert out2["frontier_urls"] > out1["frontier_urls"]
