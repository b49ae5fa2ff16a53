from .ema import EMAEstimate, EMANormalizer
from .metrics import Metric, TrainingMetrics
from .dists import (
    DiscreteActionDistributions,
    ContinuousActionDistributions,
    SymExpTwoHotDistribution,
    HLGaussDist,
    HLGaussTwoPartDist,
)
from .gae import compute_advantages, compute_returns, zscore_data
from .reorder import PolicyBatchReorderState, compute_reorder_chunks
