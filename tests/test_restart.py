import json

from strsim_tpu.parallel.restart import RunJournal, run_restartable


def test_journal_resume(tmp_path):
    path = str(tmp_path / "journal.jsonl")
    calls = []

    def run_shard(sid):
        calls.append(sid)
        return f"result-{sid}"

    stored = {}
    j = RunJournal(path)
    out = run_restartable(j, ["s0", "s1", "s2"], run_shard, stored.__setitem__)
    assert calls == ["s0", "s1", "s2"] and len(out) == 3

    # crash + restart: a fresh journal from the same file skips everything
    j2 = RunJournal(path)
    calls.clear()
    out2 = run_restartable(j2, ["s0", "s1", "s2", "s3"], run_shard, stored.__setitem__)
    assert calls == ["s3"] and list(out2) == ["s3"]
    assert j2.completed == {"s0", "s1", "s2", "s3"}


def test_journal_ignores_partial_lines(tmp_path):
    path = tmp_path / "j.jsonl"
    path.write_text(json.dumps({"shard": "a", "status": "done"}) + "\n")
    j = RunJournal(str(path))
    assert j.is_done("a") and not j.is_done("b")
