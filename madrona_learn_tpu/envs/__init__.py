from .sim_interface import SimInterface
from .fake_sim import make_fake_sim, FakeSimConfig
from .toy_env import make_toy_env, ToyEnvConfig
