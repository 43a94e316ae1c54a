#!/usr/bin/env python3
"""Kaldi-style job dispatcher: run.pl / slurm.pl role equivalent.

Behavioral reference: the reference recipes prefix every CLI call with
``${train_cmd}`` / ``${cuda_cmd}`` resolved by cmd.sh to utils/run.pl or
utils/slurm.pl (/root/reference/egs/ljspeech/voc1/run.sh:66,82,127).
Same invocation contract here:

    run_jobs.py [opts] <log> <command> [args...]
    run_jobs.py [opts] JOB=1:N <log> <command> [args...]

* ``JOB=1:N`` fans the command out N ways; every literal ``JOB`` in the
  log path and the command arguments is substituted with the job index.
* stdout/stderr of each job goes to its log file (with the kaldi header/
  footer lines: the command, start time, and "# Ended (code C) at ...").
* exit status is non-zero if ANY job fails, after all jobs finish.

Options:
    --max-jobs-run N   cap concurrent jobs (default: all at once)
    --backend local|slurm|queue|ssh|stdout
                       local  = subprocesses (run.pl)
                       slurm  = one ``sbatch --wait --array`` (slurm.pl)
                       queue  = one ``qsub -sync y [-t lo-hi]`` (queue.pl,
                                GridEngine)
                       ssh    = round-robin over --hosts (ssh.pl)
                       stdout = local, but job output is ALSO echoed to
                                this process's stdout (stdout.pl)
    --gpu G            gpus per job (slurm: --gres=gpu:G; queue: -l gpu=G)
    --mem M            memory per job (slurm, e.g. 8G; queue: -l mem=M)
    --time T           time limit (slurm, e.g. 24:00:00)
    --hosts h1,h2,...  worker hosts for the ssh backend
"""

import argparse
import os
import re
import shlex
import subprocess
import sys
import time


_DISPATCH_OPTS = ("--max-jobs-run", "--backend", "--gpu", "--mem",
                  "--time", "--hosts")


def parse_args(argv):
    parser = argparse.ArgumentParser(
        description="Run (arrays of) jobs with per-job logs.",
    )
    parser.add_argument("--max-jobs-run", type=int, default=None)
    parser.add_argument("--backend", default="local",
                        choices=["local", "slurm", "queue", "ssh",
                                 "stdout"])
    parser.add_argument("--gpu", type=int, default=0)
    parser.add_argument("--mem", default=None)
    parser.add_argument("--time", default=None)
    parser.add_argument("--hosts", default=None,
                        help="comma-separated hosts (ssh backend)")
    # dispatcher options are taken ONLY from the prefix before the
    # JOB=/log positionals (run.pl semantics) — a '--gpu' etc. appearing
    # inside the wrapped command belongs to that command, not to us
    i = 0
    head = []
    while i < len(argv):
        tok = argv[i]
        if tok in _DISPATCH_OPTS and i + 1 < len(argv):
            head += argv[i : i + 2]
            i += 2
        elif tok.split("=", 1)[0] in _DISPATCH_OPTS:
            head.append(tok)
            i += 1
        else:
            break
    args = parser.parse_args(head)
    rest = list(argv[i:])
    if not rest:
        parser.error("missing <log> <command>")
    job_range = None
    m = re.fullmatch(r"(\w+)=(\d+):(\d+)", rest[0])
    if m:
        args.job_name = m.group(1)
        job_range = (int(m.group(2)), int(m.group(3)))
        rest = rest[1:]
    else:
        args.job_name = "JOB"
    if len(rest) < 2:
        parser.error("missing <log> or <command>")
    args.log, args.command = rest[0], rest[1:]
    args.job_range = job_range
    return args


def _substitute(items, name, idx):
    return [i.replace(name, str(idx)) for i in items]


def _run_one(log, command):
    os.makedirs(os.path.dirname(os.path.abspath(log)), exist_ok=True)
    cmdline = " ".join(shlex.quote(c) for c in command)
    with open(log, "w") as f:
        f.write(f"# {cmdline}\n")
        f.write(f"# Started at {time.strftime('%a %b %d %H:%M:%S %Z %Y')}\n")
        f.flush()
        proc = subprocess.Popen(command, stdout=f, stderr=subprocess.STDOUT)
    return proc


def _finish_one(log, proc):
    code = proc.wait()
    with open(log, "a") as f:
        f.write(f"# Ended (code {code}) at "
                f"{time.strftime('%a %b %d %H:%M:%S %Z %Y')}\n")
    return code


def _expand_jobs(args):
    jobs = []
    if args.job_range is None:
        jobs.append((args.log, args.command))
    else:
        lo, hi = args.job_range
        for i in range(lo, hi + 1):
            jobs.append((
                args.log.replace(args.job_name, str(i)),
                _substitute(args.command, args.job_name, i),
            ))
    return jobs


def _run_pool(jobs, max_jobs_run, echo_logs=False, what="job"):
    """Shared bounded-concurrency pool: run (log, argv) pairs, report
    failures after all finish. ``echo_logs`` (stdout.pl role) echoes each
    job's log to our stdout as soon as that job completes."""
    max_run = max_jobs_run or len(jobs)
    running, codes = [], []

    def finish(log0, p0):
        code = _finish_one(log0, p0)
        codes.append((log0, code))
        if echo_logs:
            with open(log0) as fh:
                sys.stdout.write(fh.read())
            sys.stdout.flush()

    for log, cmd in jobs:
        while len(running) >= max_run:
            finish(*running.pop(0))
        running.append((log, _run_one(log, cmd)))
    for log0, p0 in running:
        finish(log0, p0)
    failed = [(log, c) for log, c in codes if c != 0]
    for log, c in failed:
        print(f"run_jobs.py: {what} failed (code {c}), see {log}",
              file=sys.stderr)
    return 1 if failed else 0


def run_local(args, echo_logs: bool = False):
    return _run_pool(_expand_jobs(args), args.max_jobs_run,
                     echo_logs=echo_logs)


def run_ssh(args):
    """ssh.pl role: round-robin the jobs over --hosts; logs stay local.

    Jobs run via ``ssh <host> cd <cwd> && <command>`` with output piped
    into the local per-job log (the reference's ssh.pl contract: shared
    filesystem assumed, no scheduler).
    """
    hosts = [h for h in (args.hosts or "").split(",") if h]
    if not hosts:
        print("run_jobs.py: --backend ssh needs --hosts", file=sys.stderr)
        return 1
    cwd = shlex.quote(os.getcwd())
    wrapped = [
        (log, ["ssh", "-o", "BatchMode=yes", hosts[n % len(hosts)],
               f"cd {cwd} && " + " ".join(shlex.quote(c) for c in cmd)])
        for n, (log, cmd) in enumerate(_expand_jobs(args))
    ]
    return _run_pool(wrapped, args.max_jobs_run, what="ssh job")


def _dq(s):
    """Double-quote (not shlex single-quote) so scheduler task-id
    variables substituted into the wrapper still expand inside quoted
    arguments."""
    body = (s.replace("\\", "\\\\").replace('"', '\\"')
             .replace("$", "\\$").replace("`", "\\`"))
    return f'"{body}"'


def run_queue(args):
    """queue.pl role: one synchronous GridEngine submission.

    Submits a SCRIPT FILE (matching the reference queue.pl — SGE's
    ``-b y`` rejoins and re-splits argv, so a multi-word wrapper cannot
    be passed inline) with ``-cwd -V`` so jobs keep the caller's
    working directory and environment; ``-t lo-hi`` for arrays with
    JOB -> $SGE_TASK_ID; per-job logs via shell redirection."""
    import tempfile

    qsub = ["qsub", "-sync", "y", "-cwd", "-V", "-j", "y",
            "-o", "/dev/null", "-e", "/dev/null"]
    if args.gpu:
        qsub += ["-l", f"gpu={args.gpu}"]
    if args.mem:
        qsub += ["-l", f"mem_free={args.mem},ram_free={args.mem}"]

    cmdline = " ".join(_dq(c) for c in args.command)
    log = _dq(args.log)
    if args.job_range is not None:
        lo, hi = args.job_range
        qsub += ["-t", f"{lo}-{hi}"]
        if args.max_jobs_run:
            qsub += ["-tc", str(args.max_jobs_run)]
        cmdline = cmdline.replace(args.job_name, "${SGE_TASK_ID}")
        log = log.replace(args.job_name, "${SGE_TASK_ID}")
    script = (
        "#!/usr/bin/env bash\n"
        f"mkdir -p \"$(dirname {log})\"\n"
        f"({cmdline}) > {log} 2>&1\n"
    )
    with tempfile.NamedTemporaryFile(
        "w", suffix=".sh", prefix="run_jobs_sge_", delete=False
    ) as f:
        f.write(script)
        path = f.name
    try:
        proc = subprocess.run(qsub + [path])
        return proc.returncode
    finally:
        os.unlink(path)


def run_slurm(args):
    """One sbatch --wait submission (array job for JOB ranges)."""
    sbatch = ["sbatch", "--wait", "--parsable",
              "--output=/dev/null", "--error=/dev/null"]
    if args.gpu:
        sbatch.append(f"--gres=gpu:{args.gpu}")
    if args.mem:
        sbatch.append(f"--mem={args.mem}")
    if args.time:
        sbatch.append(f"--time={args.time}")
    dq = _dq

    cmdline = " ".join(dq(c) for c in args.command)
    log = dq(args.log)
    if args.job_range is not None:
        lo, hi = args.job_range
        spec = f"--array={lo}-{hi}"
        if args.max_jobs_run:
            spec += f"%{args.max_jobs_run}"
        sbatch.append(spec)
        # expand JOB -> the slurm array task id inside the wrapper
        cmdline = cmdline.replace(args.job_name, "${SLURM_ARRAY_TASK_ID}")
        log = log.replace(args.job_name, "${SLURM_ARRAY_TASK_ID}")
    wrapper = (
        "#!/usr/bin/env bash\n"
        f"mkdir -p \"$(dirname {log})\"\n"
        f"({cmdline}) > {log} 2>&1\n"
    )
    proc = subprocess.run(sbatch + ["--wrap", wrapper])
    return proc.returncode


def main(argv=None):
    args = parse_args(argv if argv is not None else sys.argv[1:])
    if args.backend == "slurm":
        return run_slurm(args)
    if args.backend == "queue":
        return run_queue(args)
    if args.backend == "ssh":
        return run_ssh(args)
    return run_local(args, echo_logs=args.backend == "stdout")


if __name__ == "__main__":
    sys.exit(main())
