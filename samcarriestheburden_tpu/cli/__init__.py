"""Pipeline CLIs, run as ``python -m samcarriestheburden_tpu.cli.<name>``.

One module per reference entry point:
  train                      <- unet_training/training.py
  train_on_pseudo_labels     <- unet_training/training_on_pseudo_labels.py
  generate_img_embeddings    <- scripts/generate_img_embeddings.py
  save_segmentations         <- scripts/save_segmentations.py
  save_refined_segmentations <- scripts/save_refined_segmentations.py
  amg                        <- scripts/amg.py
  export_decoder             <- scripts/export_onnx_model.py (StableHLO)
  copy_and_process_imgs      <- scripts/copy_and_process_imgs.py
  define_successively_data_subsets <- scripts/define_successively_data_subsets.py
  sanity_check_saved_segmentation  <- scripts/sanity_check_saved_segmentaion.py
  hpo                        <- seg_processing/hpo_*.py
  select_pseudo_labels       -> selected_pseudo_labels_500_dsc_*.h5 (consumed by
                                the mean-teacher dataset; producer absent upstream)
"""
