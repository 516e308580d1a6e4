from style_seqcvae_tpu.ops.masked import masked_mean, masked_softmax
from style_seqcvae_tpu.ops.lstm import LSTMCellParams, init_lstm_cell, lstm_cell
