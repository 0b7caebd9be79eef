"""Sources: pages-table readers/builders and the manifest (METS analog)."""
