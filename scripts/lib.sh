# Shared helpers for the round-3 gate/bench pipeline scripts.
# Source from a script that has already cd'd to the repo root:
#   . scripts/lib.sh

# All pipeline phases log under _outputs/; a fresh checkout has no such
# directory and a failed redirection would silently burn every retry.
mkdir -p _outputs

# The axon TPU tunnel can drop for hours; probe until it answers a real
# jitted matmul (jax init HANGS rather than fails while the tunnel is down,
# hence the hard timeout per probe). ~3 min/iteration worst case x 720.
wait_for_tpu() {
  for _ in $(seq 1 720); do
    if timeout 120 python -c "
import jax
assert jax.devices()[0].platform != 'cpu'
import jax.numpy as jnp
jax.jit(lambda a: (a@a).sum())(jnp.ones((128,128))).block_until_ready()
" >/dev/null 2>&1; then
      return 0
    fi
    sleep 60
  done
  echo "TPU never came back" >&2
  return 1
}
