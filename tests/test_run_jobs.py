"""Job-dispatcher contract (egs/utils/run_jobs.py, run.pl role equivalent)."""

import os
import subprocess
import sys

RUN_JOBS = os.path.join(
    os.path.dirname(__file__), "..", "egs", "utils", "run_jobs.py"
)


def _run(args):
    return subprocess.run(
        [sys.executable, RUN_JOBS] + args, capture_output=True, text=True
    )


def test_single_job_logs_and_succeeds(tmp_path):
    log = tmp_path / "x.log"
    r = _run([str(log), "bash", "-c", "echo hello"])
    assert r.returncode == 0
    content = log.read_text()
    assert "hello" in content
    assert "# Started at" in content and "# Ended (code 0)" in content


def test_array_job_substitutes_index(tmp_path):
    r = _run([
        "JOB=1:4", str(tmp_path / "job.JOB.log"),
        "bash", "-c", "echo out-JOB",
    ])
    assert r.returncode == 0
    for i in range(1, 5):
        assert f"out-{i}" in (tmp_path / f"job.{i}.log").read_text()


def test_failure_propagates_after_all_jobs(tmp_path):
    r = _run([
        "JOB=1:3", str(tmp_path / "j.JOB.log"),
        "bash", "-c", "test JOB -ne 2 && echo ok-JOB",
    ])
    assert r.returncode == 1
    # jobs 1 and 3 still ran to completion
    assert "ok-1" in (tmp_path / "j.1.log").read_text()
    assert "ok-3" in (tmp_path / "j.3.log").read_text()
    assert "code 1" in (tmp_path / "j.2.log").read_text()
    assert "j.2.log" in r.stderr


def test_max_jobs_run_caps_concurrency(tmp_path):
    # each job appends its start, waits for a beat, then appends its end;
    # with --max-jobs-run 1 the markers must never interleave
    marker = tmp_path / "marker"
    script = (
        f"echo start-JOB >> {marker}; sleep 0.3; echo end-JOB >> {marker}"
    )
    r = _run([
        "--max-jobs-run", "1",
        "JOB=1:3", str(tmp_path / "m.JOB.log"), "bash", "-c", script,
    ])
    assert r.returncode == 0
    lines = marker.read_text().split()
    for i in (1, 2, 3):
        s, e = lines.index(f"start-{i}"), lines.index(f"end-{i}")
        assert e == s + 1, lines  # no other job ran in between


def test_command_flags_are_not_stolen(tmp_path):
    """Dispatcher options are only parsed from the prefix before the
    JOB=/log positionals — a --gpu/--mem/--time inside the wrapped
    command belongs to that command."""
    log = tmp_path / "flags.log"
    r = _run([
        str(log), "bash", "-c", 'echo "args: $0 $1 $2"', "--gpu", "2",
    ])
    assert r.returncode == 0
    assert "args: --gpu 2" in log.read_text()


def test_slurm_wrapper_expands_job_inside_quoted_args(tmp_path, monkeypatch):
    """JOB substitution must survive shell quoting of arguments with
    spaces (slurm.pl semantics: every array task gets its own path)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("run_jobs", RUN_JOBS)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    captured = {}

    def fake_run(cmd, **kw):
        captured["cmd"] = cmd

        class R:
            returncode = 0

        return R()

    monkeypatch.setattr(mod.subprocess, "run", fake_run)
    rc = mod.main([
        "--backend", "slurm", "--gpu", "1",
        "JOB=1:4", str(tmp_path / "out dir" / "log.JOB"),
        "bash", "-c", "touch 'dump dir/JOB.done'",
    ])
    assert rc == 0
    wrapper = captured["cmd"][-1]
    assert "--gres=gpu:1" in captured["cmd"]
    assert "--array=1-4" in " ".join(captured["cmd"])
    # the array-task id must expand inside BOTH the quoted command arg
    # and the quoted log path (double quotes, not shlex single quotes)
    assert "dump dir/${SLURM_ARRAY_TASK_ID}.done" in wrapper
    assert "out dir/log.${SLURM_ARRAY_TASK_ID}" in wrapper
    assert "'${SLURM_ARRAY_TASK_ID}'" not in wrapper


def test_stdout_backend_echoes_job_output(tmp_path):
    """stdout.pl role: logs are written AND echoed to our stdout."""
    import subprocess as sp

    log = tmp_path / "log.JOB"
    r = sp.run(
        [sys.executable, RUN_JOBS, "--backend", "stdout", "JOB=1:2",
         str(log), "bash", "-c", "echo payload-JOB"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0
    assert "payload-1" in r.stdout and "payload-2" in r.stdout
    assert "payload-1" in open(str(log).replace("JOB", "1")).read()


def test_queue_backend_builds_sge_submission(tmp_path, monkeypatch):
    """queue.pl role: one qsub -sync y -cwd -V [-t lo-hi] submitting a
    SCRIPT FILE (SGE -b y rejoins argv, so no inline wrapper) with
    $SGE_TASK_ID expansion inside it."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("run_jobs", RUN_JOBS)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    captured = {}

    def fake_run(cmd, **kw):
        captured["cmd"] = cmd
        # the script is deleted after submission: read it inside the mock
        captured["script"] = open(cmd[-1]).read()

        class R:
            returncode = 0

        return R()

    monkeypatch.setattr(mod.subprocess, "run", fake_run)
    rc = mod.main([
        "--backend", "queue", "--max-jobs-run", "3",
        "JOB=1:4", str(tmp_path / "log.JOB"), "echo", "piece-JOB",
    ])
    assert rc == 0
    cmd = captured["cmd"]
    joined = " ".join(cmd)
    assert cmd[0] == "qsub" and "-sync" in cmd and "-t" in cmd
    assert "-cwd" in cmd and "-V" in cmd
    assert "1-4" in joined and "-tc" in cmd
    assert cmd[-1].endswith(".sh") and not os.path.exists(cmd[-1])
    script = captured["script"]
    assert "${SGE_TASK_ID}" in script and "piece-" in script
    assert script.startswith("#!")


def test_ssh_backend_round_robins_hosts(tmp_path, monkeypatch):
    """ssh.pl role: jobs fan out over --hosts with local logs; a fake
    ssh on PATH records the host and runs the command locally."""
    import subprocess as sp

    fake_bin = tmp_path / "bin"
    fake_bin.mkdir()
    fake_ssh = fake_bin / "ssh"
    fake_ssh.write_text(
        "#!/usr/bin/env bash\n"
        '# args: -o BatchMode=yes <host> <remote-cmd>\n'
        'host="$3"\n'
        'echo "host=${host}"\n'
        'shift 3\n'
        'exec bash -c "$*"\n'
    )
    fake_ssh.chmod(0o755)
    env = dict(os.environ)
    env["PATH"] = f"{fake_bin}:{env['PATH']}"
    log = tmp_path / "log.JOB"
    r = sp.run(
        [sys.executable, RUN_JOBS, "--backend", "ssh",
         "--hosts", "hostA,hostB", "JOB=1:4", str(log),
         "bash", "-c", "echo ran-JOB"],
        capture_output=True, text=True, env=env,
    )
    assert r.returncode == 0, r.stderr
    hosts = []
    for i in range(1, 5):
        body = open(str(log).replace("JOB", str(i))).read()
        assert f"ran-{i}" in body
        hosts += [ln for ln in body.splitlines() if ln.startswith("host=")]
    assert {h.split("=")[1] for h in hosts} == {"hostA", "hostB"}
