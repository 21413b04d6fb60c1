"""Post-search filtering: sigma-G clipping, clustering/dedup, stamp coadds,
CNN vetting, brightness consistency, known-object matching, SNS filters."""
