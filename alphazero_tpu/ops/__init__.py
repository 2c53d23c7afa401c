from alphazero_tpu.ops.policy import action_probs, masked_policy, root_prior

__all__ = ["masked_policy", "action_probs", "root_prior"]
