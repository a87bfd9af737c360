// Native circuit scheduler for tfhe_tpu.
//
// Levelizes a boolean-gate netlist (Kahn topological order over wire
// dependencies) and groups same-type gates within a level into batches, so
// the Python executor can evaluate each batch as ONE batched bootstrapped
// gate call — the unit of TPU efficiency. Pure CPU control-plane work kept
// native: netlists for realistic circuits run to millions of gates, where a
// Python-loop scheduler becomes the bottleneck ahead of the TPU.
//
// C ABI (ctypes-friendly): all arrays are caller-allocated int32.

#include <algorithm>
#include <cstdint>
#include <queue>
#include <vector>

extern "C" {

// Schedule a netlist.
//
// Inputs:
//   n_gates           number of gates
//   gate_type[g]      arbitrary small non-negative type id (batch key)
//   fanin[3 * g + j]  input wire ids (-1 for unused slots)
//   out_wire[g]       output wire id (each wire written at most once)
//   n_wires           total wire count; wires never written are primary inputs
//
// Outputs:
//   gate_order[n_gates]      gate indices, batch-contiguous
//   batch_start[<=n_gates+1] offsets into gate_order (n_batches + 1 entries)
//   batch_type[<=n_gates]    gate type of each batch
//   batch_level[<=n_gates]   level of each batch
//   n_batches_out[1]
//
// Returns 0 on success, -1 on a dependency cycle, -2 on invalid input.
int tfhe_schedule_circuit(int32_t n_gates, const int32_t* gate_type,
                          const int32_t* fanin, const int32_t* out_wire,
                          int32_t n_wires, int32_t* gate_order,
                          int32_t* batch_start, int32_t* batch_type,
                          int32_t* batch_level, int32_t* n_batches_out) {
  if (n_gates < 0 || n_wires < 0) return -2;

  // writer[w] = gate writing wire w (or -1 for primary inputs).
  std::vector<int32_t> writer(n_wires, -1);
  for (int32_t g = 0; g < n_gates; ++g) {
    int32_t w = out_wire[g];
    if (w < 0 || w >= n_wires || writer[w] != -1) return -2;
    writer[w] = g;
  }

  // Dependency counts + adjacency (gate -> consumers).
  std::vector<int32_t> deps(n_gates, 0);
  std::vector<std::vector<int32_t>> consumers(n_gates);
  for (int32_t g = 0; g < n_gates; ++g) {
    for (int j = 0; j < 3; ++j) {
      int32_t w = fanin[3 * g + j];
      if (w < 0) continue;
      if (w >= n_wires) return -2;
      int32_t src = writer[w];
      if (src >= 0) {
        deps[g]++;
        consumers[src].push_back(g);
      }
    }
  }

  // Level-synchronous Kahn: peel level by level so batches never mix levels.
  std::vector<int32_t> level(n_gates, 0);
  std::vector<int32_t> frontier;
  for (int32_t g = 0; g < n_gates; ++g)
    if (deps[g] == 0) frontier.push_back(g);

  std::vector<std::vector<int32_t>> levels;
  int64_t scheduled = 0;
  while (!frontier.empty()) {
    levels.push_back(frontier);
    std::vector<int32_t> next;
    for (int32_t g : frontier) {
      scheduled++;
      for (int32_t c : consumers[g])
        if (--deps[c] == 0) {
          level[c] = level[g] + 1;
          next.push_back(c);
        }
    }
    frontier.swap(next);
  }
  if (scheduled != n_gates) return -1;  // cycle

  // Within each level, group by gate type (stable by gate index).
  int32_t n_batches = 0;
  int32_t pos = 0;
  for (size_t lv = 0; lv < levels.size(); ++lv) {
    auto& gates = levels[lv];
    // counting sort by type keeps this O(level size + distinct types)
    std::vector<std::pair<int32_t, int32_t>> keyed;
    keyed.reserve(gates.size());
    for (int32_t g : gates) keyed.push_back({gate_type[g], g});
    std::stable_sort(keyed.begin(), keyed.end());
    size_t i = 0;
    while (i < keyed.size()) {
      int32_t ty = keyed[i].first;
      batch_start[n_batches] = pos;
      batch_type[n_batches] = ty;
      batch_level[n_batches] = static_cast<int32_t>(lv);
      while (i < keyed.size() && keyed[i].first == ty) {
        gate_order[pos++] = keyed[i].second;
        ++i;
      }
      ++n_batches;
    }
  }
  batch_start[n_batches] = pos;
  *n_batches_out = n_batches;
  return 0;
}

}  // extern "C"

extern "C" {

// Assign storage slots to wires so execution never materializes dead wires.
//
// Works at BATCH granularity (the executor writes a whole batch at once):
// a batch's output wires draw fresh slots before any wire whose last read
// is in that batch frees its slot, so outputs can never alias live reads.
// Wires listed in `keep` (the circuit's requested outputs) stay live to the
// end. Peak concurrent slots is returned in n_slots_out — the executor's
// memory bound, typically << n_wires for deep circuits.
//
// Inputs mirror tfhe_schedule_circuit plus its outputs (gate_order,
// batch_start, n_batches). wire_slot_out[n_wires] receives each wire's slot
// (-1 for wires never touched). Returns 0 on success, -2 on invalid input.
int tfhe_assign_slots(int32_t n_gates, const int32_t* fanin,
                      const int32_t* out_wire, int32_t n_wires,
                      const int32_t* gate_order, const int32_t* batch_start,
                      int32_t n_batches, const int32_t* keep, int32_t n_keep,
                      int32_t* wire_slot_out, int32_t* n_slots_out) {
  if (n_gates < 0 || n_wires < 0 || n_batches < 0) return -2;
  const int32_t kInf = INT32_MAX;

  std::vector<int32_t> writer(n_wires, -1);
  for (int32_t g = 0; g < n_gates; ++g) {
    if (out_wire[g] < 0 || out_wire[g] >= n_wires) return -2;
    writer[out_wire[g]] = g;
  }
  // batch index of each gate in scheduled order
  std::vector<int32_t> gate_batch(n_gates, -1);
  for (int32_t b = 0; b < n_batches; ++b)
    for (int32_t p = batch_start[b]; p < batch_start[b + 1]; ++p)
      gate_batch[gate_order[p]] = b;

  // last batch reading each wire; kInf pins a wire live forever
  std::vector<int32_t> last_use(n_wires, -1);
  for (int32_t g = 0; g < n_gates; ++g)
    for (int j = 0; j < 3; ++j) {
      int32_t w = fanin[3 * g + j];
      if (w < 0) continue;
      if (w >= n_wires) return -2;
      last_use[w] = std::max(last_use[w], gate_batch[g]);
    }
  for (int32_t i = 0; i < n_keep; ++i) {
    if (keep[i] < 0 || keep[i] >= n_wires) return -2;
    last_use[keep[i]] = kInf;
  }

  std::fill(wire_slot_out, wire_slot_out + n_wires, -1);
  std::vector<int32_t> free_slots;
  int32_t next_slot = 0;
  auto alloc = [&](int32_t w) {
    if (free_slots.empty()) {
      wire_slot_out[w] = next_slot++;
    } else {
      wire_slot_out[w] = free_slots.back();
      free_slots.pop_back();
    }
  };
  // primary inputs (read but never written) live from the start
  for (int32_t w = 0; w < n_wires; ++w)
    if (writer[w] < 0 && last_use[w] != -1) alloc(w);

  // wires dying in batch b, freed after batch b's outputs are placed
  std::vector<std::vector<int32_t>> dies(n_batches);
  for (int32_t w = 0; w < n_wires; ++w)
    if (last_use[w] >= 0 && last_use[w] != kInf) dies[last_use[w]].push_back(w);

  int32_t peak = next_slot;
  for (int32_t b = 0; b < n_batches; ++b) {
    for (int32_t p = batch_start[b]; p < batch_start[b + 1]; ++p) {
      int32_t w = out_wire[gate_order[p]];
      if (last_use[w] == -1 && wire_slot_out[w] == -1) {
        // written, never read, not kept: still needs a slot for the write
        last_use[w] = b;
        dies[b].push_back(w);
      }
      alloc(w);
    }
    peak = std::max(peak, next_slot);
    for (int32_t w : dies[b]) free_slots.push_back(wire_slot_out[w]);
  }
  *n_slots_out = peak;
  return 0;
}

}  // extern "C"
