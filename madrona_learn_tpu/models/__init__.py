from .common import LayerNorm, MLP
from .gru import GRU
from .lstm import LSTM
from .attention import SelfAttention, EntitySelfAttentionNet
from .critics import (
    DenseLayerDiscreteActor,
    DictActor,
    DenseLayerCritic,
    DreamerV3Critic,
    HLGaussCritic,
    HLGaussTwoPartCritic,
    make_hlgauss_bins,
    make_hlgauss_two_part_bins,
)
from .actor_critic import (
    ActorCritic,
    Backbone,
    BackboneEncoder,
    RecurrentBackboneEncoder,
    BackboneShared,
    BackboneSeparate,
)
from .transformer_memory import WindowAttentionMemory
