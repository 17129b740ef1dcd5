#!/bin/bash
# Radix on/off A/B at the online knee (round-5 VERDICT #8).
#
# The reference's online protocol is a comparison against a no-radix
# baseline (README.md:155-181, SGLang --disable-radix). The harsh trace
# has radix-friendly prefix groups by design (gen_trace.py --profile
# harsh), so the cache column of the knee is measurable online.
#
# Runs two servers sequentially (radix, naive) on the same port, waits for
# background warmup to drain, sweeps the knee for each, and merges both
# into BENCH_TRACE_r05.json.
#
# Usage: bash benchmark/online/knee_ab.sh [trace] [out.json]
set -u
REPO="$(cd "$(dirname "$0")/../.." && pwd)"
TRACE="${1:-/tmp/harsh.jsonl}"
OUT="${2:-$REPO/BENCH_TRACE_r05.json}"
PORT=30160
SCALES="2.0 1.5 1.25 1.1 1.0 0.8 0.6"

[ -f "$TRACE" ] || python "$REPO/benchmark/online/gen_trace.py" "$TRACE" \
    --profile harsh --num 200

run_one() {
    local cache="$1" outfile="$2"
    local log="/tmp/srv_knee_${cache}.log"
    # NB setsid may FORK (when the shell job is not a session leader), so
    # $! is the wrapper, not the server's process group — killing -$! then
    # silently leaves the server alive (first A/B attempt: the previous
    # leg's server survived into the next sweep). exec + a pidfile records
    # the real session-leader pid.
    setsid nohup bash -c "echo \$\$ > /tmp/knee_srv.pid; exec python -m \
        minisgl_tpu --model '$REPO/assets/qwen3-0.6b' \
        --dummy-weight --port $PORT --max-running-req 128 \
        --max-seq-len 2048 --kv-dtype int8 --quantization int8 \
        --decode-steps 8 --pipeline-depth 4 --cache $cache" \
        > "$log" 2>&1 < /dev/null &
    sleep 2
    local SRV_PGID
    SRV_PGID=$(cat /tmp/knee_srv.pid)
    # wait for health + background warmup completion (compiles drain while
    # serving; a cold sweep measures compile ambushes, not the scheduler)
    for i in $(seq 1 240); do
        sleep 10
        if grep -q "background warmup:" "$log" 2>/dev/null; then
            break
        fi
    done
    curl -s -m 5 "http://127.0.0.1:$PORT/health" || true
    # Compiled executables still pay a per-process device program LOAD on
    # first execution (~2-4 s each through the remote runtime), drained
    # one per idle scheduler iteration. A 30 s sleep was NOT enough: the
    # first A/B attempt measured TTFT p99 of 34-66 s on BOTH legs — load
    # ambushes, not scheduling. Prime with a discarded light replay, then
    # idle long enough for the ~74 variants' loads to drain.
    python "$REPO/benchmark/online/bench_knee.py" \
        --url "http://127.0.0.1:$PORT" --trace "$TRACE" --num 120 \
        --scales 3.0 --slo-ttft-p99-ms 1e9 --out /tmp/knee_discard.json \
        || true
    sleep 300
    python "$REPO/benchmark/online/bench_knee.py" \
        --url "http://127.0.0.1:$PORT" --trace "$TRACE" --num 200 \
        --scales $SCALES --out "$outfile"
    kill -- -"$SRV_PGID" 2>/dev/null
    sleep 10
}

run_one radix /tmp/knee_radix.json
run_one naive /tmp/knee_naive.json

python - "$OUT" <<'EOF'
import json, sys
radix = json.load(open("/tmp/knee_radix.json"))
naive = json.load(open("/tmp/knee_naive.json"))
out = {
    "metric": "online_knee_radix_vs_naive",
    "unit": "req/s",
    "value": radix.get("value"),
    "vs_baseline": None,
    "protocol": radix["protocol"] + " ; A/B vs --cache naive "
    "(reference README online protocol: vs SGLang --disable-radix)",
    "radix": radix,
    "naive": naive,
    "radix_knee_req_s": radix.get("value"),
    "naive_knee_req_s": naive.get("value"),
}
with open(sys.argv[1], "w") as f:
    f.write(json.dumps(out) + "\n")
print(json.dumps({k: out[k] for k in ("radix_knee_req_s", "naive_knee_req_s")}))
EOF
