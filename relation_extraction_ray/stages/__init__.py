"""Actor-pool stages beyond the NLP core (media decode/feature plumbing)."""
