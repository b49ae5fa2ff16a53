from .sim_interface import SimInterface, as_sim_fns
from .fake_sim import (
    FakeSimConfig,
    make_fake_sim,
    FakeNet,
    FakeRNN,
    FakeActor,
    FakeCritic,
    FakeActionDist,
)
from .toy_env import ToyEnvConfig, make_toy_env, make_duel_env
