from alphazero_tpu.ops.policy import action_probs, masked_policy

__all__ = ["masked_policy", "action_probs"]
