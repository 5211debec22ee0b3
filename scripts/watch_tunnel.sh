#!/bin/bash
# Poll the TPU tunnel; the moment jax.devices() answers, fire the round-3
# campaign chain (scripts/round3_campaign.sh).  Run in the background:
#     bash scripts/watch_tunnel.sh &
set -u
cd /root/repo
mkdir -p outputs/round3
echo "tunnel watch start $(date -u +%FT%TZ)" >> outputs/round3/watch.log
FIRES=0
DEADLINE=$(cat outputs/round3/deadline 2>/dev/null || echo $(($(date +%s) + 43200)))
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  if timeout 240 python - <<'EOF' >> outputs/round3/watch.log 2>&1
import jax, time
t0 = time.time()
d = jax.devices()
import jax.numpy as jnp
x = jnp.ones((128, 128)); v = float((x @ x).sum())  # real compute + fetch
print(f"tunnel ALIVE: {d} compute={v} ({time.time()-t0:.1f}s)")
EOF
  then
    FIRES=$((FIRES + 1))
    echo "tunnel alive at $(date -u +%FT%TZ); launching campaign chain (fire $FIRES)" \
        >> outputs/round3/watch.log
    bash scripts/round3_campaign.sh >> outputs/round3/chain_stdout.log 2>&1
    echo "campaign chain exited at $(date -u +%FT%TZ)" >> outputs/round3/watch.log
    # The chain's legs are idempotent/resumable (tpu_check and bench re-run,
    # the campaigns resume from checkpoints, reporting replaces its section),
    # so if the tunnel flapped mid-chain, keep polling and fire again —
    # bounded, so a hard-broken backend cannot spin the chip forever.
    if [ -f outputs/flagship_vendor/summary.json ] || [ "$FIRES" -ge 4 ]; then
      echo "watch done after $FIRES fire(s)" >> outputs/round3/watch.log
      exit 0
    fi
  fi
  sleep 120
done
echo "watch deadline reached at $(date -u +%FT%TZ)" >> outputs/round3/watch.log
