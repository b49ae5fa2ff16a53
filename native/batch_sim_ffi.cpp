// XLA FFI custom-call handler for the batched simulator.
//
// This is the production integration path for external native engines on
// CPU-attached backends: the sim step becomes a first-class XLA custom call
// inside the compiled program (zero Python in the loop), exactly how a
// Madrona-style engine plugs into the trainer. The handler wraps the same
// stateless step as batch_sim.cpp's C ABI.
//
// Build: make -C native libbatch_sim_ffi.so  (needs jaxlib's ffi headers,
// located via `python -c "import jax.ffi; print(jax.ffi.include_dir())"`).

#include <cstdint>

#include "xla/ffi/api/ffi.h"

namespace ffi = xla::ffi;

// From batch_sim.cpp (linked into the same shared object).
extern "C" void batch_sim_step(
    int64_t n, int32_t grid_size, int32_t episode_len, uint64_t seed,
    int32_t num_threads, const int32_t* pos_in, const int32_t* tgt_in,
    const int32_t* t_in, const int32_t* rng_ctr_in, const int32_t* actions,
    const int32_t* resets, int32_t* pos_out, int32_t* tgt_out,
    int32_t* t_out, int32_t* rng_ctr_out, float* obs_delta, float* obs_time,
    float* rewards, uint8_t* dones);

static ffi::Error BatchSimStepImpl(
    ffi::Buffer<ffi::DataType::S32> pos,
    ffi::Buffer<ffi::DataType::S32> tgt,
    ffi::Buffer<ffi::DataType::S32> t,
    ffi::Buffer<ffi::DataType::S32> rng_ctr,
    ffi::Buffer<ffi::DataType::S32> actions,
    ffi::Buffer<ffi::DataType::S32> resets,
    ffi::Result<ffi::Buffer<ffi::DataType::S32>> pos_out,
    ffi::Result<ffi::Buffer<ffi::DataType::S32>> tgt_out,
    ffi::Result<ffi::Buffer<ffi::DataType::S32>> t_out,
    ffi::Result<ffi::Buffer<ffi::DataType::S32>> rng_ctr_out,
    ffi::Result<ffi::Buffer<ffi::DataType::F32>> obs_delta,
    ffi::Result<ffi::Buffer<ffi::DataType::F32>> obs_time,
    ffi::Result<ffi::Buffer<ffi::DataType::F32>> rewards,
    ffi::Result<ffi::Buffer<ffi::DataType::U8>> dones,
    int32_t grid_size, int32_t episode_len, int64_t seed,
    int32_t num_threads) {
  const int64_t n = t.element_count();

  batch_sim_step(
      n, grid_size, episode_len, static_cast<uint64_t>(seed), num_threads,
      pos.typed_data(), tgt.typed_data(), t.typed_data(),
      rng_ctr.typed_data(), actions.typed_data(), resets.typed_data(),
      pos_out->typed_data(), tgt_out->typed_data(), t_out->typed_data(),
      rng_ctr_out->typed_data(), obs_delta->typed_data(),
      obs_time->typed_data(), rewards->typed_data(), dones->typed_data());

  return ffi::Error::Success();
}

XLA_FFI_DEFINE_HANDLER(
    kBatchSimStep, BatchSimStepImpl,
    ffi::Ffi::Bind()
        .Arg<ffi::Buffer<ffi::DataType::S32>>()   // pos [n, 2]
        .Arg<ffi::Buffer<ffi::DataType::S32>>()   // target [n, 2]
        .Arg<ffi::Buffer<ffi::DataType::S32>>()   // t [n, 1]
        .Arg<ffi::Buffer<ffi::DataType::S32>>()   // rng_ctr [n, 1]
        .Arg<ffi::Buffer<ffi::DataType::S32>>()   // actions [n, 1]
        .Arg<ffi::Buffer<ffi::DataType::S32>>()   // resets (pre-expanded) [n, 1]
        .Ret<ffi::Buffer<ffi::DataType::S32>>()   // pos_out
        .Ret<ffi::Buffer<ffi::DataType::S32>>()   // tgt_out
        .Ret<ffi::Buffer<ffi::DataType::S32>>()   // t_out
        .Ret<ffi::Buffer<ffi::DataType::S32>>()   // rng_ctr_out
        .Ret<ffi::Buffer<ffi::DataType::F32>>()   // obs_delta
        .Ret<ffi::Buffer<ffi::DataType::F32>>()   // obs_time
        .Ret<ffi::Buffer<ffi::DataType::F32>>()   // rewards
        .Ret<ffi::Buffer<ffi::DataType::U8>>()    // dones
        .Attr<int32_t>("grid_size")
        .Attr<int32_t>("episode_len")
        .Attr<int64_t>("seed")
        .Attr<int32_t>("num_threads"));

extern "C" XLA_FFI_Handler* batch_sim_step_ffi_handler() {
  return kBatchSimStep;
}
