from style_seqcvae_tpu.decoding.beam_search import beam_search
from style_seqcvae_tpu.decoding.cbs import constrained_beam_search
from style_seqcvae_tpu.decoding.fsm import FiniteStateMachineBuilder, pack_fsm
from style_seqcvae_tpu.decoding.select import (
    select_best_beam,
    select_best_beam_with_constraints,
    valid_state_mask_simple,
)
