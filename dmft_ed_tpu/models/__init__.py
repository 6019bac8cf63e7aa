"""Model drivers (the reference's drivers/ catalog, config-driven).

Families:
  hm_bethe            single/multi-band Bethe-lattice Hubbard (canonical)
  hm_bethe_nbands     multi-band Hund alias
  ahm_bethe           attractive-U superconducting Bethe
  ahm_square          attractive-U square lattice (k-sum Nambu Gloc)
  ahm_stripe          periodic-U stripe supercell (per-site U, Nambu k-sum)
  haldane_sc          attractive-U Haldane model (2-sublattice Nambu k-sum)
  kspace_afm          2-sublattice Neel DMFT over any Bloch Hk (graphene/square)
  material            H(k)-file driven DMFT (ed_STO/ed_LVO/ed_SIO class)
  bhz_2d              BHZ topological insulator (k-space)
  bhz_3d              3D BHZ strong TI (spin-mixed Bloch, normal solver)
  bhz_edge            BHZ strip with open edges (layer-resolved DMFT)
  soc                 t2g + atomic L.S (nonsu2 + replica bath)
  kspace              generic k-space loop + square/graphene/haldane/
                      kane-mele Bloch Hamiltonians
  nano                real-space DMFT over arbitrary Hij + site symmetry
                      (run_sc: the superc ed_nano_sc variant)
  tblg                twisted-bilayer-graphene Wannier flat bands (file-driven Hk)
  hm_square_lattice   square-flake geometry wrapper over nano
  ehm_bethe           extended Hubbard (Hartree W0 shift, ed_ehm_bethe)
  ahm_2bands          2-band attractive-U, bandwidth ratio alpha
  bhz_afm             BHZ AFM supercells (afm2/afm4 2D, afm8 3D)
  wsm_slab            Weyl-semimetal slab, layer-resolved DMFT
  blg                 bilayer graphene AA/AB stackings (4-sublattice)
  lattice_loop        shared inequivalent-site k-space DMFT loop
  soc_ineq            t2g+SOC inequivalent sites (ed_SOC_ineq)
  twisted_blg         microscopic twisted BLG + effective flat-band model
                      (ed_twistedBLG / ed_effective_tBLG)
  bhz_edge_afm        BHZ edge strip with AFM stripe order
  hm_multiband        named multiband Bloch builders (2b/3b square, 2b
                      cubic, daghofer, fcc3d-hyb, square_2nn)
  hm_2bands_bethe     2-band Bethe with bandwidth ratio (Wband array)
  hm_dos              DOS-file-driven loops (ed_hm_square_dos/2bands_dos)
  nano_isoc_sq        square-torus intrinsic SOC + chi0(q) + local Chern
  hartree_nano        static Hartree mean-field nano loop (hartree_nano)
"""

from . import (hm_bethe, hm_bethe_nbands, hm_bethe_afm, ahm_bethe, bhz_2d,
               soc, kspace, nano, hm_square_lattice, hm_slab, ahm_disorder,
               tblg, ahm_square, bhz_3d, ahm_stripe, haldane_sc,
               kspace_afm, material, bhz_edge, ehm_bethe, ahm_2bands,
               bhz_afm, wsm_slab, blg, lattice_loop, soc_ineq,
               twisted_blg, bhz_edge_afm, hm_multiband, hm_2bands_bethe,
               hm_dos, nano_isoc_sq, hartree_nano)

__all__ = ["hm_bethe", "hm_bethe_nbands", "hm_bethe_afm", "ahm_bethe",
           "bhz_2d", "soc", "kspace", "nano", "hm_square_lattice",
           "hm_slab", "ahm_disorder", "tblg", "ahm_square", "bhz_3d",
           "ahm_stripe", "haldane_sc", "kspace_afm", "material", "bhz_edge",
           "ehm_bethe", "ahm_2bands", "bhz_afm", "wsm_slab", "blg",
           "lattice_loop", "soc_ineq", "twisted_blg", "bhz_edge_afm",
           "hm_multiband", "hm_2bands_bethe", "hm_dos", "nano_isoc_sq",
           "hartree_nano"]
