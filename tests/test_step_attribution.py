"""FLOP-parse regression for scripts/step_attribution.py, chip-free.

The parser reads optimized HLO text; these fixtures are minimal copies
of the real TPU lowerings that burned us (r5): the TPU backend lowers a
BATCHED dot_general to `convolution-base-dilated` with the batch dim as
a spatial window of size=B and lhs_dilate=B (dim_labels 0bf_0oi->0bf) —
without the lhs_dilate discount the conditional configs parsed 7x over
XLA's cost_analysis (cfg2: 28.5 vs 4.0 TFLOP — 733 TFLOP/s at the
measured step time, physically impossible on a 197-peak chip), and the
DCGAN's stride-2 ConvTranspose path parsed 2.07x over."""

import importlib.util
import os

_path = os.path.join(os.path.dirname(__file__), os.pardir, "scripts",
                     "step_attribution.py")
_spec = importlib.util.spec_from_file_location("step_attribution", _path)
step_attribution = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(step_attribution)
attribute = step_attribution.attribute


def _total(buckets):
  return sum(f for dd in buckets.values() for f in dd.values())


def test_plain_conv_flops_and_bucket():
  hlo = """
  %k1 = bf16[3,3,16,32]{3,2,1,0} parameter(0)
  %x1 = bf16[8,32,32,16]{3,2,1,0} parameter(1)
  %conv1 = bf16[8,32,32,32]{3,2,1,0} convolution(%x1, %k1), window={size=3x3 pad=1_1x1_1}, dim_labels=b01f_01io->b01f, metadata={op_name="jit(outer_step)/jvp(Generator)/block0/conv/conv_general_dilated"}
  """
  buckets, _ = attribute(hlo)
  # 2 * out_elems * (3*3*16) MACs-per-output
  assert _total(buckets) == 2 * (8 * 32 * 32 * 32) * (3 * 3 * 16)
  assert set(buckets) == {"conv"}


def test_batched_dot_as_base_dilated_conv_counts_once():
  # Verbatim shape of the measured TPU lowering of
  # einsum('nsc,noc->nso') at (4,8,6)x(4,5,6): batch dim -> spatial
  # window size=4 with lhs_dilate=4. True FLOPs = 2*4*8*5*6 = 1920
  # (validated against the live lowering on-chip, 2026-08-19).
  hlo = """
  %a2 = bf16[4,8,6]{1,2,0} parameter(0)
  %b2 = bf16[4,5,6]{2,1,0} parameter(1)
  ROOT %convolution-base-dilated.1 = bf16[4,8,5]{2,1,0} convolution(%a2, %b2), window={size=4 stride=3 lhs_dilate=4}, dim_labels=0bf_0oi->0bf, metadata={op_name="jit(outer_step)/jvp(Generator)/block2/nc2/nc2._fused_wc_cond/nsc,noc->nso/dot_general"}
  """
  buckets, _ = attribute(hlo)
  assert _total(buckets) == 2 * 4 * 8 * 5 * 6
  assert set(buckets) == {"whiten"}  # _fused_wc_cond scope


def test_conv_transpose_lhs_dilate_discount():
  # DCGAN G block: 4x4 stride-2 ConvTranspose = lhs_dilate=2x2 conv;
  # each output sees 2x2 of the 4x4 taps -> divide the output-based
  # count by 4.
  hlo = """
  %k3 = bf16[4,4,16,32]{3,2,1,0} parameter(0)
  %x3 = bf16[8,8,8,16]{3,2,1,0} parameter(1)
  %tconv = bf16[8,16,16,32]{3,2,1,0} convolution(%x3, %k3), window={size=4x4 pad=2_2x2_2 lhs_dilate=2x2}, dim_labels=b01f_01io->b01f, metadata={op_name="jit(outer_step)/jvp(Generator)/dcgan_block0/ConvTranspose_0/conv_transpose"}
  """
  buckets, _ = attribute(hlo)
  assert _total(buckets) == 2 * (8 * 16 * 16 * 32) * (4 * 4 * 16) // 4


def test_small_contraction_dot_as_padded_reversal_conv():
  # Verbatim shape of the measured cfg4 TPU lowering of the
  # soft-assignment fold einsum('nk,koc->noc') at k=10, c=512: the dot
  # becomes a window={size=512 pad=511_511 rhs_reversal=1} conv over a
  # LENGTH-1 lhs spatial dim, so 511 of every 512 window taps are
  # padding zeros. True FLOPs = 2*n*o*c*k; the full-tap count is 512x
  # that (5.48 parsed TFLOP of whiten-f32 on cfg4, implying an
  # impossible 128.7 model TFLOP/s against the 107 TFLOP/s
  # mix-adjusted ceiling).
  hlo = """
  %a4 = f32[128,10,1]{1,0,2} parameter(0)
  %b4 = f32[10,512,512]{2,0,1} parameter(1)
  %conv4 = f32[128,512,512]{2,0,1} convolution(%a4, %b4), window={size=512 pad=511_511 rhs_reversal=1}, dim_labels=bf0_i0o->b0f, operand_precision={highest,highest}, metadata={op_name="jit(outer_step)/jvp(Generator)/block1/nc1/nc1._fused_wc_cond/nk,koc->noc/dot_general"}
  """
  buckets, _ = attribute(hlo)
  assert _total(buckets) == 2 * 128 * 512 * 512 * 10
  assert set(buckets) == {"whiten"}


def test_true_dot_unaffected():
  hlo = """
  %l1 = f32[64,128]{1,0} parameter(0)
  %r1 = f32[128,256]{1,0} parameter(1)
  %d1 = f32[64,256]{1,0} dot(%l1, %r1), lhs_contracting_dims={1}, rhs_contracting_dims={0}, metadata={op_name="jit(outer_step)/whiten/newton_schulz/_ns_iterate/dot_general"}
  """
  buckets, _ = attribute(hlo)
  assert _total(buckets) == 2 * 64 * 256 * 128
  assert buckets["whiten"]["f32"] == 2 * 64 * 256 * 128
