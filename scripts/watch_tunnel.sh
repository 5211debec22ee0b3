#!/bin/bash
# Poll the TPU tunnel; the moment jax.devices() answers, fire the round-3
# campaign chain (scripts/round3_campaign.sh).  Run in the background:
#     bash scripts/watch_tunnel.sh &
set -u
cd /root/repo
mkdir -p outputs/round3
echo "tunnel watch start $(date -u +%FT%TZ)" >> outputs/round3/watch.log
while true; do
  if timeout 90 python - <<'EOF' >> outputs/round3/watch.log 2>&1
import jax, time
t0 = time.time()
d = jax.devices()
import jax.numpy as jnp
x = jnp.ones((128, 128)); v = float((x @ x).sum())  # real compute + fetch
print(f"tunnel ALIVE: {d} compute={v} ({time.time()-t0:.1f}s)")
EOF
  then
    echo "tunnel alive at $(date -u +%FT%TZ); launching campaign chain" \
        >> outputs/round3/watch.log
    bash scripts/round3_campaign.sh >> outputs/round3/chain_stdout.log 2>&1
    echo "campaign chain exited at $(date -u +%FT%TZ)" >> outputs/round3/watch.log
    exit 0
  fi
  sleep 120
done
