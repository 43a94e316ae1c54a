# Job-dispatch configuration (role equivalent of the reference cmd.sh,
# /root/reference/egs/cvss_c/voc1/cmd.sh). Both commands share the
# unified interface:
#
#   ${train_cmd} [JOB=1:N] <log> <command...>
#
# backed by egs/utils/run_jobs.py (run.pl semantics locally, slurm.pl
# semantics via --backend slurm: one sbatch --wait array submission).
# Pick the backend by editing these lines or exporting CMD_BACKEND.

backend="${CMD_BACKEND:-local}"

if [ "${backend}" = "slurm" ]; then
    train_cmd="python3 ../../utils/run_jobs.py --backend slurm"
    cuda_cmd="python3 ../../utils/run_jobs.py --backend slurm --gpu 1"
else
    train_cmd="python3 ../../utils/run_jobs.py"
    cuda_cmd="python3 ../../utils/run_jobs.py"
fi
export train_cmd cuda_cmd
