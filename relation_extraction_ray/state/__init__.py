from .scorer import ScorerWeights, score_batch, weights_fixture

__all__ = ["ScorerWeights", "score_batch", "weights_fixture"]
