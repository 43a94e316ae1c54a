# Job-dispatch configuration (role equivalent of the reference cmd.sh,
# /root/reference/egs/ljspeech/voc1/cmd.sh). Both commands share the
# unified interface:
#
#   ${train_cmd} [JOB=1:N] <log> <command...>
#
# backed by egs/utils/run_jobs.py (run.pl semantics locally, slurm.pl
# semantics via --backend slurm: one sbatch --wait array submission).
# Pick the backend by editing these lines or exporting CMD_BACKEND.

backend="${CMD_BACKEND:-local}"

# any run_jobs.py backend works here: local (run.pl), slurm (slurm.pl),
# queue (queue.pl/SGE), ssh (ssh.pl, set CMD_HOSTS), stdout (stdout.pl)
if [ "${backend}" = "local" ]; then
    train_cmd="python3 ../../utils/run_jobs.py"
    cuda_cmd="python3 ../../utils/run_jobs.py"
else
    extra=""
    [ -n "${CMD_HOSTS:-}" ] && extra="--hosts ${CMD_HOSTS}"
    train_cmd="python3 ../../utils/run_jobs.py --backend ${backend} ${extra}"
    # only the accelerator command requests a device (run.pl/slurm.pl split)
    gpu_extra=""
    [ "${backend}" = "slurm" ] || [ "${backend}" = "queue" ] && gpu_extra="--gpu 1"
    cuda_cmd="python3 ../../utils/run_jobs.py --backend ${backend} ${gpu_extra} ${extra}"
fi
export train_cmd cuda_cmd
