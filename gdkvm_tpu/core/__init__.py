"""Pure numerics: GDR recurrence, LKVA read/write, KPFF fusion."""
