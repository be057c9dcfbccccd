#!/bin/sh
# Backend entrypoint (reference back-end/start.sh capability).
# RELOAD=true restarts the server on source changes for dev composes.
set -e

PORT="${PORT:-8000}"
ARGS="--host 0.0.0.0 --port ${PORT}"
[ -n "${FUSION_PARAMS}" ] && ARGS="${ARGS} --fusion_params ${FUSION_PARAMS}"
[ -n "${VIVIT_PARAMS}" ] && ARGS="${ARGS} --vivit_params ${VIVIT_PARAMS}"
[ -n "${WAV_PARAMS}" ] && ARGS="${ARGS} --wav_params ${WAV_PARAMS}"
# Production warm-start posture (README "Serving latency"): camera
# formats to pre-compile crop graphs for, and a representative clip
# replayed end-to-end so the first real request runs at steady state.
[ -n "${WARMUP_RESOLUTIONS}" ] && ARGS="${ARGS} --warmup_resolutions ${WARMUP_RESOLUTIONS}"
[ -n "${WARMUP_UPLOAD}" ] && ARGS="${ARGS} --warmup_upload ${WARMUP_UPLOAD}"
[ "${WARMUP}" = "true" ] && ARGS="${ARGS} --warmup"

if [ "${RELOAD}" = "true" ]; then
    # naive dev reload: rerun on mmer_tpu mtime changes
    while true; do
        python -m mmer_tpu.serve.app ${ARGS} &
        PID=$!
        touch /tmp/.reload_stamp
        while [ -z "$(find mmer_tpu -name '*.py' -newer /tmp/.reload_stamp | head -1)" ]; do
            sleep 2
            kill -0 ${PID} 2>/dev/null || break
        done
        kill ${PID} 2>/dev/null || true
        wait ${PID} 2>/dev/null || true
    done
else
    exec python -m mmer_tpu.serve.app ${ARGS}
fi
